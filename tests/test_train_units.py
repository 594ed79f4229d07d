"""Unit tests for the training layer: optimizer param groups, schedules,
pipeline batch assembly, checkpoint transfer surgery, mesh helpers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.config import Config
from vlp_tpu.data.pipeline import ArrayBundle, DeviceLoader
from vlp_tpu.data.preprocess_host import ImageCache
from vlp_tpu.data.sampler import ShuffleBatchSampler
from vlp_tpu.data.tokenize import HashTokenizer, tokenize_all_captions
from vlp_tpu.parallel.mesh import create_mesh, shard_batch
from vlp_tpu.train.optim import make_optimizer, make_schedule
from vlp_tpu.utils.checkpoint import graft_backbone


class TestSchedules:
    def test_cosine_endpoints(self):
        cfg = Config()
        cfg.scheduler.name = "cosine"
        cfg.trainer.max_epochs = 10
        sched = make_schedule(1e-3, cfg, steps_per_epoch=5)
        assert float(sched(0)) == pytest.approx(1e-3)
        assert float(sched(5 * 10)) == pytest.approx(0.0, abs=1e-9)
        assert float(sched(5 * 5)) == pytest.approx(5e-4, rel=1e-6)

    def test_cosine_warmup(self):
        cfg = Config()
        cfg.scheduler.name = "cosine_warmup"
        cfg.scheduler.warmup_epochs = 4
        cfg.trainer.max_epochs = 10
        sched = make_schedule(1e-3, cfg, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(20)) == pytest.approx(5e-4, rel=1e-6)  # epoch 2/4
        assert float(sched(40)) == pytest.approx(1e-3, rel=1e-6)  # warmup end
        assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)

    def test_none_constant(self):
        cfg = Config()
        cfg.scheduler.name = "none"
        assert make_schedule(1e-3, cfg, 10) == 1e-3


class TestParamGroups:
    def _fake_params(self):
        return {
            "backbone": {"conv1": {"kernel": jnp.ones((3, 3))}},
            "head": {"kernel": jnp.ones((4, 1)), "bias": jnp.zeros(1)},
        }

    def test_frozen_backbone_gets_zero_updates(self):
        cfg = Config()
        cfg.model.task = "only_imaging"
        cfg.model.freeze_encoder = True
        params = self._fake_params()
        tx = make_optimizer(cfg, params, steps_per_epoch=10)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert float(jnp.abs(updates["backbone"]["conv1"]["kernel"]).sum()) == 0.0
        assert float(jnp.abs(updates["head"]["kernel"]).sum()) > 0.0

    def test_split_lr(self):
        cfg = Config()
        cfg.model.task = "only_imaging"
        cfg.optimizer.name = "sgd"
        cfg.scheduler.name = "none"
        cfg.optimizer.lr = 1.0
        cfg.model.vision_encoder_lr = 0.1
        params = self._fake_params()
        tx = make_optimizer(cfg, params, steps_per_epoch=10)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert float(updates["backbone"]["conv1"]["kernel"][0, 0]) == pytest.approx(-0.1)
        assert float(updates["head"]["kernel"][0, 0]) == pytest.approx(-1.0)

    def test_vlp_tower_groups(self):
        cfg = Config()
        cfg.model.task = "vision_language"
        cfg.optimizer.name = "sgd"
        cfg.scheduler.name = "none"
        cfg.optimizer.lr = 1.0
        cfg.model.image_encoder_lr = 0.0  # frozen image tower
        cfg.model.text_encoder_lr = 0.5
        params = {
            "image_encoder": {"k": jnp.ones(3)},
            "text_encoder": {"k": jnp.ones(3)},
            "image_projection": jnp.ones((4, 2)),
            "logit_scale": jnp.ones(()),
        }
        tx = make_optimizer(cfg, params, steps_per_epoch=10)
        updates, _ = tx.update(jax.tree.map(jnp.ones_like, params),
                               tx.init(params), params)
        assert float(jnp.abs(updates["image_encoder"]["k"]).sum()) == 0.0
        assert float(updates["text_encoder"]["k"][0]) == pytest.approx(-0.5)
        assert float(updates["image_projection"][0, 0]) == pytest.approx(-1.0)


class TestPipeline:
    def _bundle(self, n=10):
        imgs = np.arange(n * 8 * 8, dtype=np.uint8).reshape(n, 8, 8)
        cache = ImageCache.from_arrays(imgs)
        samples = [{"dataset": "INTERNAL" if i % 2 == 0 else "BTXRD",
                    "image_path": f"s{i}", "tumor": i % 2,
                    "clinical": np.zeros(15, np.float32)} for i in range(n)]
        return ArrayBundle(samples, cache)

    def test_assemble_pads_and_masks(self):
        b = self._bundle()
        batch = b.assemble([7, 8, 9], batch_size=4)
        assert batch["image_u8"].shape == (4, 8, 8)
        assert batch["mask"].tolist() == [1, 1, 1, 0]
        assert batch["label"].tolist()[:3] == [1, 0, 1]
        assert batch["dataset_id"].tolist()[:2] == [1, 0]

    def test_device_loader_covers_epoch(self):
        b = self._bundle(10)
        loader = DeviceLoader(b, ShuffleBatchSampler(10, 4, seed=0), 4)
        batches = list(loader)
        assert len(batches) == 3
        total = sum(int(x["mask"].sum()) for x in batches)
        assert total == 10

    def test_resident_gather_matches_host_path(self, monkeypatch):
        """Device-resident corpus (HBM gather) must produce byte-identical
        batches to the host assemble path, including padded tails."""
        b = self._bundle(10)
        host = DeviceLoader(b, ShuffleBatchSampler(10, 4, seed=3), 4)
        monkeypatch.setenv("VLP_DEVICE_RESIDENT_MB", "0")  # force host path
        host._corpus = None
        hb = list(host)
        monkeypatch.setenv("VLP_DEVICE_RESIDENT_MB", "4096")
        res = DeviceLoader(b, ShuffleBatchSampler(10, 4, seed=3), 4)
        assert res._corpus is not None, "resident mode did not engage"
        rb = list(res)
        assert len(hb) == len(rb)
        for x, y in zip(hb, rb):
            assert set(x) == set(y)
            for k in x:
                np.testing.assert_array_equal(np.asarray(x[k]),
                                              np.asarray(y[k]), err_msg=k)

    def test_slow_consumer_still_gets_sentinel(self):
        """Regression: a consumer that processes each item for longer than
        the producer's put-timeout (e.g. a cold-compile train step) must
        still terminate — the end-of-epoch sentinel retries instead of
        being dropped when the queue is momentarily full."""
        import time

        b = self._bundle(10)
        loader = DeviceLoader(b, ShuffleBatchSampler(10, 4, seed=1), 4)
        seen = 0
        for _ in loader:
            time.sleep(1.3)  # > the 0.1 s / (old 1.0 s) put timeouts
            seen += 1
        assert seen == 3

    def test_abandoned_iteration_does_not_leak_producer(self):
        import threading
        import time

        b = self._bundle(10)
        loader = DeviceLoader(b, ShuffleBatchSampler(10, 4, seed=2), 4)
        before = threading.active_count()
        it = iter(loader)
        next(it)
        it.close()  # abandon mid-epoch -> stop event fires via finally
        time.sleep(0.5)
        assert threading.active_count() <= before + 1  # producer exited

    def test_resident_scan_chunks_match(self, monkeypatch):
        monkeypatch.setenv("VLP_DEVICE_RESIDENT_MB", "4096")
        b = self._bundle(10)
        res = DeviceLoader(b, ShuffleBatchSampler(10, 4, seed=5), 4)
        assert res._corpus is not None
        kinds = []
        total = 0
        for kind, payload in res.iter_scan_chunks(2):
            kinds.append(kind)
            m = np.asarray(payload["mask"])
            total += int(m.sum())
            if kind == "chunk":
                assert np.asarray(payload["image_u8"]).shape == (2, 4, 8, 8)
        assert kinds == ["chunk", "single"]  # 3 batches -> 1 chunk + tail
        assert total == 10

    def test_pretrain_bundle_tokens(self):
        imgs = np.zeros((4, 8, 8), np.uint8)
        cache = ImageCache.from_arrays(imgs)
        samples = [{"dataset": "MURA", "image_path": f"p{i}", "label": i % 2,
                    "caption": f"cap {i}", "caption_id": i} for i in range(4)]
        tokens = tokenize_all_captions({"train": samples}, "distilbert", 8)
        ids, mask = tokens["train"]
        b = ArrayBundle(samples, cache, token_ids=ids, token_mask=mask)
        batch = b.assemble([0, 1], 2)
        assert batch["input_ids"].shape == (2, 8)
        assert batch["caption_id"].tolist() == [0, 1]


class TestTokenizer:
    def test_hash_tokenizer_deterministic(self):
        tok = HashTokenizer()
        a, am = tok(["a radiograph of a knee", "hello"], 10)
        b, bm = tok(["a radiograph of a knee", "hello"], 10)
        np.testing.assert_array_equal(a, b)
        assert a[0, 0] == 101  # CLS
        assert am[0].sum() > am[1].sum()
        # same word -> same id across calls/positions
        c, _ = tok(["knee knee"], 10)
        assert c[0, 1] == c[0, 2]

    def test_truncation(self):
        tok = HashTokenizer()
        ids, mask = tok(["w " * 100], 8)
        assert ids.shape == (1, 8)
        assert mask[0].sum() == 8


class TestCheckpointSurgery:
    def test_graft_backbone(self):
        classifier = {"backbone": {"conv": jnp.zeros((2, 2))},
                      "head": {"kernel": jnp.zeros((4, 1))}}
        encoder = {"conv": jnp.ones((2, 2))}
        out = graft_backbone(classifier, encoder)
        assert float(out["backbone"]["conv"].sum()) == 4.0
        assert float(out["head"]["kernel"].sum()) == 0.0  # head untouched

    def test_graft_shape_mismatch_raises(self):
        classifier = {"backbone": {"conv": jnp.zeros((2, 2))}}
        with pytest.raises(ValueError, match="shape mismatch"):
            graft_backbone(classifier, {"conv": jnp.ones((3, 3))})

    def test_graft_missing_key_raises(self):
        classifier = {"backbone": {"conv": jnp.zeros((2, 2))}}
        with pytest.raises(KeyError):
            graft_backbone(classifier, {"other": jnp.ones((2, 2))})


class TestMesh:
    def test_create_mesh_all_devices(self):
        mesh = create_mesh()
        assert mesh.size == 8  # conftest forces 8 CPU devices
        assert mesh.axis_names == ("data",)

    def test_shard_batch_places_on_mesh(self):
        mesh = create_mesh()
        batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
        sharded = shard_batch(batch, mesh)
        assert sharded["x"].sharding.num_devices == 8

    def test_oversized_request_raises(self):
        with pytest.raises(ValueError):
            create_mesh(data_parallel=64)


class TestHashTokenizerGuard:
    def test_pretrained_tower_with_hash_tokenizer_raises(self, monkeypatch):
        """VERDICT r1 weak #8: pretrained BERT weights + hash-vocab token
        ids must hard-error, not silently degrade."""
        from vlp_tpu.config import Config
        from vlp_tpu.train import driver as drv

        cfg = Config()
        cfg.model.task = "vision_language"
        cfg.model.text_model = "tinybert"
        cfg.data.tokenizer = "tinybert"

        class FakeTrainer:
            class state:  # noqa: N801 - minimal stand-in
                params = {"text_encoder": {}}

        monkeypatch.setattr("vlp_tpu.models.bert.load_hf_weights",
                            lambda params, key: {"converted": True})
        monkeypatch.setattr(
            "vlp_tpu.data.tokenize.tokenizer_is_hash_fallback",
            lambda name: True)
        with pytest.raises(RuntimeError, match="hash"):
            drv._maybe_load_pretrained_text_tower(cfg, FakeTrainer())

    def test_hash_fallback_detection(self):
        from vlp_tpu.data.tokenize import (
            HashTokenizer,
            get_tokenizer,
            tokenizer_is_hash_fallback,
        )

        # in this zero-egress image the HF vocab may or may not be staged;
        # the detector must agree with whatever get_tokenizer returns
        got = tokenizer_is_hash_fallback("tinybert")
        assert got == isinstance(get_tokenizer("tinybert"), HashTokenizer)


class TestReviewRegressions:
    def test_fold_mean_std_cache_keys_on_options(self, tmp_path):
        """Stats cached under one preprocessing config must not be reused
        for another (review r3: the key ignored image_size/crop/etc)."""
        from vlp_tpu.data.preprocess_host import ImageCache, fold_mean_std

        imgs_a = np.full((4, 8, 8), 10, np.uint8)
        imgs_b = np.full((4, 8, 8), 200, np.uint8)
        ca = ImageCache.from_arrays(imgs_a, paths=[f"p{i}" for i in range(4)])
        cb = ImageCache.from_arrays(imgs_b, paths=[f"p{i}" for i in range(4)])
        ca.options_key = "size=224|crop=False"
        cb.options_key = "size=512|crop=True"  # same paths, other config
        m_a, _ = fold_mean_std(ca, range(4), str(tmp_path))
        m_b, _ = fold_mean_std(cb, range(4), str(tmp_path))
        assert m_a == pytest.approx(10.0)
        assert m_b == pytest.approx(200.0)  # not the cached 10.0

    def test_linear_probe_skips_single_class(self):
        from vlp_tpu.train.callbacks import LinearProbeCallback

        def extract(_):
            x = np.random.default_rng(0).normal(size=(10, 4))
            return x, np.zeros(10, int), x, np.zeros(10, int)

        probe = LinearProbeCallback(extract, every_n_epochs=1)
        assert probe.on_validation_start(0, {}) == {}  # no crash

    def test_bayes_sweep_all_failed_trials_falls_back(self, tmp_path):
        from vlp_tpu.train.sweep import SweepEngine

        eng = SweepEngine({"method": "bayes",
                           "parameters": {"lr": {"values": [1e-3, 1e-4]}}},
                          str(tmp_path))
        for _ in range(6):  # past the bayes gate with zero successes
            eng.history.append({"params": {"lr": 1e-3}, "value": None})
        out = eng._suggest_bayes()  # must not raise
        assert out["lr"] in (1e-3, 1e-4)
