"""Distributed-path correctness on the 8-device CPU mesh: shard_map
global-batch InfoNCE == single-device loss; sharded train step == unsharded;
metric psum reduction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.ops import losses
from vlp_tpu.parallel.infonce import global_infonce_shard_map
from vlp_tpu.parallel.mesh import batch_sharding, create_mesh, replicated, shard_batch


class TestShardMapInfoNCE:
    def _data(self, b=32, e=16, seed=0):
        rng = np.random.default_rng(seed)
        img = jnp.asarray(rng.normal(size=(b, e)).astype(np.float32))
        txt = jnp.asarray(rng.normal(size=(b, e)).astype(np.float32))
        return img, txt

    def test_matches_single_device(self):
        img, txt = self._data()
        scale = jnp.float32(np.exp(2.0))
        mask = jnp.ones(32)
        ref = losses.symmetric_infonce(
            losses.clip_logits(img, txt, jnp.log(scale), scale_max=1e9), mask)
        mesh = create_mesh()
        fn = global_infonce_shard_map(mesh)
        sh = batch_sharding(mesh)
        out = fn(jax.device_put(img, sh), jax.device_put(txt, sh),
                 jax.device_put(scale, replicated(mesh)),
                 jax.device_put(mask, sh))
        assert abs(float(out) - float(ref)) < 1e-4

    def test_masked_padding_matches(self):
        img, txt = self._data(b=32)
        mask = jnp.array([1.0] * 24 + [0.0] * 8)
        scale = jnp.float32(20.0)
        ref = losses.symmetric_infonce(
            losses.clip_logits(img, txt, jnp.log(scale), scale_max=1e9), mask)
        mesh = create_mesh()
        fn = global_infonce_shard_map(mesh)
        sh = batch_sharding(mesh)
        out = fn(jax.device_put(img, sh), jax.device_put(txt, sh),
                 jax.device_put(scale, replicated(mesh)),
                 jax.device_put(mask, sh))
        assert abs(float(out) - float(ref)) < 1e-4


class TestShardedTrainStep:
    def test_sharded_equals_unsharded(self):
        """One VLP train step on the 8-device mesh produces the same loss
        and (replicated) params as the single-device step."""
        from vlp_tpu.config import Config
        from vlp_tpu.models.tasks import TaskStatics, build_task
        from vlp_tpu.train.optim import make_optimizer
        from vlp_tpu.train.state import TrainState
        from vlp_tpu.train.step import make_train_step

        cfg = Config()
        cfg.model.task = "vision_language"
        # micro towers: same stem/BN-sync/attention code paths as the full
        # models, ~4x less CPU compile — this test checks SHARDING, not
        # capacity
        cfg.model.model = "resnet_micro"
        cfg.model.text_model = "microbert"
        cfg.trainer.precision = "fp32"
        # SGD so the update is proportional to the gradient: adam's m/sqrt(v)
        # normalization turns fp reduction-order noise on near-zero grads
        # into +-lr sign flips, which is optimizer behavior, not a sharding
        # correctness signal.
        cfg.optimizer.name = "sgd"
        cfg.scheduler.name = "none"
        cfg.optimizer.lr = 0.01
        cfg.data.disable_augmentations = True  # deterministic step
        from vlp_tpu.ops.augment import AugmentConfig

        statics = TaskStatics(mean=128.0, std=30.0,
                              augment=AugmentConfig(enabled=False))
        task = build_task(cfg, statics)
        rng = np.random.default_rng(0)
        B, S = 16, 32
        batch = {
            "image_u8": jnp.asarray(rng.integers(0, 255, (B, S, S),
                                                 dtype=np.uint8)),
            "input_ids": jnp.asarray(rng.integers(1, 100, (B, 8),
                                                  dtype=np.int32)),
            "attention_mask": jnp.ones((B, 8), jnp.int32),
            "caption_id": jnp.arange(B, dtype=jnp.int32),
            "label": jnp.zeros((B,), jnp.int32),
            "mask": jnp.ones((B,), jnp.float32),
        }
        variables = task.init_variables(jax.random.key(0), batch)
        tx = make_optimizer(cfg, variables["params"], 10)

        def fresh_state():
            # deep-copy: the train step donates its input state buffers
            v = jax.tree.map(jnp.array, variables)
            return TrainState.create(
                v["params"],
                {k: x for k, x in v.items() if k != "params"},
                tx, jax.random.key(1))

        # single device
        step1 = make_train_step(task, tx, mesh=None)
        s1, aux1 = step1(fresh_state(), batch)
        # 8-device mesh
        mesh = create_mesh()
        step8 = make_train_step(task, tx, mesh=mesh)
        state8 = jax.device_put(fresh_state(), replicated(mesh))
        s8, aux8 = step8(state8, shard_batch(batch, mesh))
        assert abs(float(aux1["loss"]) - float(aux8["loss"])) < 1e-4
        # updated params agree
        p1 = jax.tree.leaves(s1.params)
        p8 = jax.tree.leaves(s8.params)
        worst = max(float(jnp.abs(a - b).max()) for a, b in zip(p1, p8))
        assert worst < 1e-4, f"param divergence {worst}"

        # --- FSDP (ZeRO) state sharding: identical math, sharded memory ---
        from vlp_tpu.parallel.mesh import shard_train_state

        state_f, shardings = shard_train_state(fresh_state(), mesh, "fsdp")
        # at least one large leaf must actually be sharded over 'data'
        specs = [s.spec for s in jax.tree.leaves(
            jax.tree.map(lambda x: x.sharding, state_f.params))]
        assert any("data" in str(sp) for sp in specs), specs
        step_f = make_train_step(task, tx, mesh=mesh,
                                 state_shardings=shardings)
        sf, auxf = step_f(state_f, shard_batch(batch, mesh))
        assert abs(float(aux1["loss"]) - float(auxf["loss"])) < 1e-4
        pf = jax.tree.leaves(sf.params)
        worst = max(float(jnp.abs(a - b).max()) for a, b in zip(p1, pf))
        assert worst < 1e-4, f"fsdp param divergence {worst}"
        # updated params keep their FSDP sharding (no silent re-replication)
        out_specs = [str(x.sharding.spec) for x in pf]
        assert any("data" in sp for sp in out_specs), out_specs


class TestMetricPsum:
    def test_metric_states_add(self):
        from vlp_tpu.ops import metrics as M

        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=64).astype(np.float32))
        labels = jnp.asarray((rng.random(64) < 0.5).astype(np.float32))
        full = M.update_state(M.init_state(), logits, labels)
        parts = [M.update_state(M.init_state(), logits[i::8], labels[i::8])
                 for i in range(8)]
        merged = parts[0]
        for p in parts[1:]:
            merged = M.merge_states(merged, p)
        for k, v in M.compute_metrics(full).items():
            assert abs(float(v) - float(M.compute_metrics(merged)[k])) < 1e-6


class TestInfoNCEImplWiring:
    """mesh.infonce_impl (config/core.py) must have a consumer: the VLP
    loss selects the chunked shard_map global-batch InfoNCE (VERDICT r2 #5).
    """

    def _cfg(self, impl):
        from vlp_tpu.config import Config

        cfg = Config()
        cfg.model.task = "vision_language"
        cfg.model.model = "resnet_micro"
        cfg.model.text_model = "microbert"
        cfg.trainer.precision = "fp32"
        cfg.optimizer.name = "sgd"
        cfg.scheduler.name = "none"
        cfg.optimizer.lr = 0.01
        cfg.data.disable_augmentations = True
        cfg.mesh.infonce_impl = impl
        return cfg

    def test_invalid_impl_rejected(self):
        from vlp_tpu.models.tasks import TaskStatics, build_task
        from vlp_tpu.ops.augment import AugmentConfig

        cfg = self._cfg("bogus")
        with pytest.raises(ValueError, match="infonce_impl"):
            build_task(cfg, TaskStatics(mean=128.0, std=30.0,
                                        augment=AugmentConfig(enabled=False)))

    def test_shard_map_impl_step_matches_gspmd(self):
        """One mesh train step under each impl: same loss, same params."""
        from vlp_tpu.models.tasks import TaskStatics, build_task
        from vlp_tpu.ops.augment import AugmentConfig
        from vlp_tpu.train.optim import make_optimizer
        from vlp_tpu.train.state import TrainState
        from vlp_tpu.train.step import make_train_step

        statics = TaskStatics(mean=128.0, std=30.0,
                              augment=AugmentConfig(enabled=False))
        rng = np.random.default_rng(1)
        B, S = 16, 32
        batch = {
            "image_u8": jnp.asarray(rng.integers(0, 255, (B, S, S),
                                                 dtype=np.uint8)),
            "input_ids": jnp.asarray(rng.integers(1, 100, (B, 8),
                                                  dtype=np.int32)),
            "attention_mask": jnp.ones((B, 8), jnp.int32),
            "caption_id": jnp.arange(B, dtype=jnp.int32),
            "label": jnp.zeros((B,), jnp.int32),
            # padded tail: the shard_map path must mask identically
            "mask": jnp.asarray([1.0] * 12 + [0.0] * 4, jnp.float32),
        }
        mesh = create_mesh()
        results = {}
        for impl in ("gspmd", "shard_map"):
            task = build_task(self._cfg(impl), statics)
            variables = task.init_variables(jax.random.key(0), batch)
            tx = make_optimizer(self._cfg(impl), variables["params"], 10)
            state = TrainState.create(
                variables["params"],
                {k: x for k, x in variables.items() if k != "params"},
                tx, jax.random.key(1))
            step = make_train_step(task, tx, mesh=mesh)
            s, aux = step(jax.device_put(state, replicated(mesh)),
                          shard_batch(batch, mesh))
            results[impl] = (float(aux["loss"]), jax.tree.leaves(s.params))
        l_g, p_g = results["gspmd"]
        l_s, p_s = results["shard_map"]
        assert abs(l_g - l_s) < 1e-4
        worst = max(float(jnp.abs(a - b).max()) for a, b in zip(p_g, p_s))
        assert worst < 1e-4, f"param divergence {worst}"

    def test_shard_map_avoids_global_logits_buffer(self):
        """Memory claim: per shard, the chunked loss materializes only its
        [B_local, B_global] row block — the compiled module must contain no
        full [B_g, B_g] buffer (the GSPMD dense path does)."""
        mesh = create_mesh()
        B, E = 256, 32
        rng = np.random.default_rng(2)
        sh = batch_sharding(mesh)
        img = jax.device_put(jnp.asarray(rng.normal(size=(B, E)),
                                         jnp.float32), sh)
        txt = jax.device_put(jnp.asarray(rng.normal(size=(B, E)),
                                         jnp.float32), sh)
        scale = jax.device_put(jnp.float32(20.0), replicated(mesh))
        mask = jax.device_put(jnp.ones(B, jnp.float32), sh)

        sm = jax.jit(global_infonce_shard_map(mesh))
        hlo_sm = sm.lower(img, txt, scale, mask).compile().as_text()
        assert "f32[256,256]" not in hlo_sm
        assert "f32[32,256]" in hlo_sm  # the local row block


class TestGlobalCaptionUniquenessUnderSharding:
    """VERDICT r3 #8: the labels-are-positions InfoNCE correctness argument
    (parallel/infonce.py:13-16) rests on the sampler building GLOBAL
    caption-unique batches BEFORE sharding. Pin that invariant: run the
    real sharded loader (DeviceLoader over the CPU-8 mesh) on a dataset
    with duplicated captions and assert every main-phase *global* batch is
    caption-unique — and that the shard_map loss on a loader-produced batch
    equals the dense single-device path. Reference semantics:
    UniqueCaptionSampler.py:95-129 (main phase), :131-169 (tail)."""

    def _loader(self, mesh, n=48, dup=2, bs=8, seed=3):
        from collections import Counter

        from vlp_tpu.data.pipeline import ArrayBundle, DeviceLoader
        from vlp_tpu.data.preprocess_host import ImageCache
        from vlp_tpu.data.sampler import NoDuplicateCaptionSampler

        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, size=(n, 8, 8), dtype=np.uint8)
        cache = ImageCache.from_arrays(imgs)
        cids = [i // dup for i in range(n)]  # every caption duplicated
        samples = [{"dataset": "MURA" if i % 2 else "LERA",
                    "image_path": f"s{i}", "label": i % 2,
                    "caption_id": cids[i]} for i in range(n)]
        bundle = ArrayBundle(
            samples, cache,
            token_ids=np.tile(np.arange(6, dtype=np.int32), (n, 1)),
            token_mask=np.ones((n, 6), np.int32))
        sampler = NoDuplicateCaptionSampler(n, cids, bs, seed=seed)
        return DeviceLoader(bundle, sampler, bs, mesh), Counter(cids), bs

    def test_global_batches_caption_unique(self):
        mesh = create_mesh()
        loader, counts, bs = self._loader(mesh)
        for epoch in range(2):
            remaining = dict(counts)
            seen_valid = 0
            for batch in loader:
                # global (unsharded) view of the sharded batch
                cid = np.asarray(jax.device_get(batch["caption_id"]))
                mask = np.asarray(jax.device_get(batch["mask"])) > 0
                assert len(batch["caption_id"].sharding.device_set) == 8
                valid = cid[mask]
                n_avail = sum(1 for v in remaining.values() if v > 0)
                if n_avail >= bs:  # main phase: uniqueness MUST hold
                    assert len(set(valid.tolist())) == len(valid), \
                        f"duplicate caption in a main-phase global batch " \
                        f"(epoch {epoch}): {sorted(valid.tolist())}"
                for c in valid.tolist():
                    remaining[c] -= 1
                seen_valid += len(valid)
            # epoch coverage: every sample consumed exactly once globally
            assert seen_valid == sum(counts.values())
            assert all(v == 0 for v in remaining.values()), remaining

    def test_loader_batch_loss_matches_dense(self):
        """shard_map InfoNCE on a loader-produced sharded batch == dense
        single-device loss on the same global batch."""
        mesh = create_mesh()
        loader, _, _ = self._loader(mesh)
        batch = next(iter(loader))
        cid = np.asarray(jax.device_get(batch["caption_id"]))
        mask_np = np.asarray(jax.device_get(batch["mask"]))
        rng = np.random.default_rng(5)
        # embeddings keyed off the batch contents (deterministic)
        img = rng.normal(size=(len(cid), 16)).astype(np.float32) + \
            cid[:, None].astype(np.float32)
        txt = rng.normal(size=(len(cid), 16)).astype(np.float32)
        scale = jnp.float32(20.0)
        dense = losses.symmetric_infonce(
            losses.clip_logits(jnp.asarray(img), jnp.asarray(txt),
                               jnp.log(scale), scale_max=1e9),
            jnp.asarray(mask_np))
        sh = batch_sharding(mesh)
        fn = global_infonce_shard_map(mesh)
        out = fn(jax.device_put(jnp.asarray(img), sh),
                 jax.device_put(jnp.asarray(txt), sh),
                 jax.device_put(scale, replicated(mesh)),
                 jax.device_put(jnp.asarray(mask_np), sh))
        assert abs(float(out) - float(dense)) < 1e-4


class TestTensorParallel:
    def test_tp_step_equals_unsharded(self):
        """One VLP train step on a 2-D (data=4, model=2) mesh with tensor-
        parallel weight sharding produces the same loss and params as the
        single-device step — GSPMD partitions the matmuls over the model
        axis and inserts the forward all-reduces; math must not change."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vlp_tpu.config import Config
        from vlp_tpu.models.tasks import TaskStatics, build_task
        from vlp_tpu.ops.augment import AugmentConfig
        from vlp_tpu.parallel.mesh import (create_mesh, shard_batch,
                                           shard_train_state)
        from vlp_tpu.train.optim import make_optimizer
        from vlp_tpu.train.state import TrainState
        from vlp_tpu.train.step import make_train_step

        cfg = Config()
        cfg.model.task = "vision_language"
        cfg.model.model = "resnet_micro"
        cfg.model.text_model = "microbert"
        cfg.trainer.precision = "fp32"
        cfg.optimizer.name = "sgd"  # see TestShardedTrainStep rationale
        cfg.scheduler.name = "none"
        cfg.optimizer.lr = 0.01
        cfg.data.disable_augmentations = True
        statics = TaskStatics(mean=128.0, std=30.0,
                              augment=AugmentConfig(enabled=False))
        task = build_task(cfg, statics)
        rng = np.random.default_rng(0)
        B, S = 16, 32
        batch = {
            "image_u8": jnp.asarray(rng.integers(0, 255, (B, S, S),
                                                 dtype=np.uint8)),
            "input_ids": jnp.asarray(rng.integers(1, 100, (B, 8),
                                                  dtype=np.int32)),
            "attention_mask": jnp.ones((B, 8), jnp.int32),
            "caption_id": jnp.arange(B, dtype=jnp.int32),
            "label": jnp.zeros((B,), jnp.int32),
            "mask": jnp.ones((B,), jnp.float32),
        }
        variables = task.init_variables(jax.random.key(0), batch)
        tx = make_optimizer(cfg, variables["params"], 10)

        def fresh_state():
            v = jax.tree.map(jnp.array, variables)
            return TrainState.create(
                v["params"],
                {k: x for k, x in v.items() if k != "params"},
                tx, jax.random.key(1))

        step1 = make_train_step(task, tx, mesh=None)
        s1, aux1 = step1(fresh_state(), batch)

        mesh = create_mesh(model_parallel=2)
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.shape == (4, 2)
        state_t, shardings = shard_train_state(fresh_state(), mesh, "tp")
        specs = [str(x.sharding.spec) for x in
                 jax.tree.leaves(state_t.params)]
        assert any("model" in sp for sp in specs), specs
        step_t = make_train_step(task, tx, mesh=mesh,
                                 state_shardings=shardings)
        st, auxt = step_t(state_t, shard_batch(batch, mesh))
        assert abs(float(aux1["loss"]) - float(auxt["loss"])) < 1e-4
        p1 = jax.tree.leaves(s1.params)
        pt = jax.tree.leaves(st.params)
        worst = max(float(jnp.abs(a - b).max()) for a, b in zip(p1, pt))
        assert worst < 1e-4, f"tp param divergence {worst}"
        # updated params keep their TP sharding (no silent re-replication)
        out_specs = [str(x.sharding.spec) for x in pt]
        assert any("model" in sp for sp in out_specs), out_specs

    def test_tp_requires_model_axis(self):
        import pytest

        from vlp_tpu.parallel.mesh import create_mesh, shard_train_state
        from vlp_tpu.train.state import TrainState
        import jax
        import jax.numpy as jnp
        import optax

        mesh = create_mesh()  # 1-D
        state = TrainState.create({"w": jnp.zeros((4,))}, {},
                                  optax.sgd(0.1), jax.random.key(0))
        with pytest.raises(ValueError, match="model"):
            shard_train_state(state, mesh, "tp")

    def test_driver_rejects_inconsistent_tp_config(self, tmp_path):
        import pytest

        from vlp_tpu.config import get_experiment
        from vlp_tpu.train.driver import train

        cfg = get_experiment("smoke_synthetic_only_imaging")
        cfg.output_dir = str(tmp_path)
        cfg.mesh.param_sharding = "tp"  # without model_parallel>1
        with pytest.raises(ValueError, match="model_parallel"):
            train(cfg)
        cfg2 = get_experiment("smoke_synthetic_pretrain")
        cfg2.output_dir = str(tmp_path)
        cfg2.mesh.model_parallel = 2
        cfg2.mesh.infonce_impl = "shard_map"
        with pytest.raises(ValueError, match="gspmd"):
            train(cfg2)
        cfg3 = get_experiment("smoke_synthetic_only_imaging")
        cfg3.output_dir = str(tmp_path)
        cfg3.mesh.model_parallel = 2
        cfg3.mesh.param_sharding = "fsdp"  # data-axis-only; model axis idle
        with pytest.raises(ValueError, match="fsdp"):
            train(cfg3)

    def test_trainer_e2e_under_tp(self, tmp_path):
        """The delivered driver path (train()) runs a full epoch on the
        2-D (data=4, model=2) mesh with param_sharding=tp and produces the
        SAME epoch loss as the plain-DP run (fp32, identical seeds/data
        order) — TP is a first-class Trainer mode whose math must match,
        not just a step-factory feature that avoids NaN."""
        from vlp_tpu.config import get_experiment
        from vlp_tpu.train.driver import train

        def run(tag, **mesh_overrides):
            cfg = get_experiment("smoke_synthetic_only_imaging")
            cfg.output_dir = str(tmp_path / tag)
            for k, v in mesh_overrides.items():
                setattr(cfg.mesh, k, v)
            cfg.trainer.max_epochs = 1
            cfg.trainer.scan_steps = 1  # see MeshConfig CPU-mesh note
            agg = train(cfg)
            loss_keys = [k for k in agg if k.endswith("train/loss_mean")]
            assert loss_keys, sorted(agg)
            val = agg[loss_keys[0]]
            assert val == val, f"NaN loss under {tag}: {agg}"
            return val

        dp = run("dp_run")
        tp = run("tp_run", model_parallel=2, param_sharding="tp")
        assert abs(dp - tp) < 1e-3, (dp, tp)
