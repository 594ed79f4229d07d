"""Async checkpointing semantics: Orbax writes overlap training and commit
lazily; the meta sidecar and old-best deletion are deferred to the commit
barrier, so readers after ``wait()``/``fit()`` always see a consistent
(body, sidecar) pair and exactly one best checkpoint.

The reference's Lightning ModelCheckpoint writes synchronously
(configs/callbacks/model_checkpoint_*.yaml); async background commit is the
TPU-production redesign — checkpoint I/O must never stall the device.
"""
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.utils.checkpoint import (Checkpointer, LastStateSaver, restore,
                                      restore_train_state)


def _tree(seed: float):
    return {
        "params": {"w": jnp.full((4, 4), seed, jnp.float32)},
        "extra_vars": {},
    }


class TestAsyncCheckpointer:
    def test_best_tracking_and_commit(self, tmp_path):
        ck = Checkpointer(str(tmp_path), "val/auroc", "max", async_write=True)
        assert ck.maybe_save({"val/auroc": 0.5}, _tree(1.0), epoch=0,
                             meta={"epoch": 0})
        first = ck.best_path
        assert ck.maybe_save({"val/auroc": 0.4}, _tree(9.0), epoch=1) is False
        assert ck.maybe_save({"val/auroc": 0.7}, _tree(2.0), epoch=2,
                             meta={"epoch": 2})
        ck.wait()
        # exactly one best on disk; it is the improved one
        dirs = [d for d in glob.glob(str(tmp_path / "epoch*"))
                if os.path.isdir(d)]
        assert dirs == [ck.best_path]
        assert not os.path.exists(first)
        assert not os.path.exists(first + ".meta.json")
        got = restore(ck.best_path, _tree(0.0))
        np.testing.assert_array_equal(np.asarray(got["params"]["w"]), 2.0)
        meta = json.load(open(ck.best_path + ".meta.json"))
        assert meta["epoch"] == 2
        assert meta["checkpoint_best"] == pytest.approx(0.7)
        assert meta["checkpoint_best_path"] == ck.best_path

    def test_sidecar_deferred_until_commit(self, tmp_path):
        """The sidecar must never exist before the body is durable: it is
        written by the commit barrier, not by maybe_save itself."""
        ck = Checkpointer(str(tmp_path), "m", "max", async_write=True)
        ck.maybe_save({"m": 1.0}, _tree(3.0), epoch=0, meta={"epoch": 0})
        # commit not yet awaited -> sidecar must not be on disk
        assert not os.path.exists(ck.best_path + ".meta.json")
        ck.wait()
        assert os.path.exists(ck.best_path + ".meta.json")

    def test_restore_best_implies_barrier(self, tmp_path):
        ck = Checkpointer(str(tmp_path), "m", "min", async_write=True)
        ck.maybe_save({"m": 5.0}, _tree(7.0), epoch=0)
        got = ck.restore_best(_tree(0.0))  # no explicit wait()
        np.testing.assert_array_equal(np.asarray(got["params"]["w"]), 7.0)

    def test_sync_mode_commits_eagerly(self, tmp_path):
        ck = Checkpointer(str(tmp_path), "m", "max", async_write=False)
        ck.maybe_save({"m": 1.0}, _tree(1.5), epoch=0, meta={"epoch": 0})
        assert os.path.exists(ck.best_path + ".meta.json")


class TestLastStateSaver:
    def _state(self, step: int):
        from vlp_tpu.train.state import TrainState

        import optax

        params = {"w": jnp.full((2, 2), float(step), jnp.float32)}
        tx = optax.sgd(1e-2)
        return TrainState(params=params, extra_vars={},
                          opt_state=tx.init(params),
                          step=jnp.asarray(step, jnp.int32),
                          rng=jax.random.key(step))

    def test_overwrite_and_resume(self, tmp_path):
        saver = LastStateSaver(str(tmp_path / "last"), async_write=True)
        saver.save(self._state(1), meta={"epoch": 0})
        saver.save(self._state(2), meta={"epoch": 1})  # implicit commit of #1
        saver.wait()
        meta = json.load(open(str(tmp_path / "last") + ".meta.json"))
        assert meta["epoch"] == 1
        got = restore_train_state(str(tmp_path / "last"), self._state(0))
        assert int(np.asarray(got.step)) == 2
        np.testing.assert_array_equal(np.asarray(got.params["w"]), 2.0)

    def test_sidecar_deferred(self, tmp_path):
        saver = LastStateSaver(str(tmp_path / "last"), async_write=True)
        saver.save(self._state(1), meta={"epoch": 0})
        assert not os.path.exists(str(tmp_path / "last") + ".meta.json")
        saver.wait()
        assert os.path.exists(str(tmp_path / "last") + ".meta.json")


@pytest.mark.slow
def test_trainer_async_default_resumable(tmp_path):
    """End to end with the default async_checkpointing=true: fit() returns
    only after all writes are durable — 'last' + sidecar are immediately
    resumable and the best checkpoint restorable."""
    from vlp_tpu.config import Config, apply_overrides
    from vlp_tpu.data.datamodule import build_datamodule
    from vlp_tpu.models.tasks import build_task
    from vlp_tpu.train.loop import Trainer

    cfg = Config()
    cfg = apply_overrides(cfg, [
        "data.name=synthetic_downstream", "data.image_size=32",
        "data.batch_size=8", "data.eval_batch_size=8",
        "data.synthetic_num_samples=24", "model.model=resnet_micro",
        "trainer.max_epochs=2", "trainer.cache_train_embeddings=false",
    ])
    cfg.output_dir = str(tmp_path)
    assert cfg.trainer.async_checkpointing is True
    dm = build_datamodule(cfg)
    fold = next(dm.folds())
    task = build_task(cfg, fold.statics)
    tr = Trainer(cfg, task, fold.train_loader, fold.val_loaders,
                 checkpoint_dir=str(tmp_path / "ck"))
    tr.fit()
    assert os.path.exists(tmp_path / "ck" / "last.meta.json")
    meta = json.load(open(tmp_path / "ck" / "last.meta.json"))
    assert meta["epoch"] == 1
    tr2 = Trainer(cfg, task, fold.train_loader, fold.val_loaders,
                  checkpoint_dir=str(tmp_path / "ck2"))
    tr2.load_resume_state(str(tmp_path / "ck" / "last"))
    assert tr2.start_epoch == 2
    best = tr.checkpointer.restore_best(
        {"params": tr.state.params, "extra_vars": tr.state.extra_vars})
    assert "params" in best
