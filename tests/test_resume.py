"""Exact-resume semantics: train(N) == train(k) + resume(N-k) with a
bitwise-equal loss trajectory. Full-state checkpoints carry params, BN
stats, optimizer moments, step, device RNG, loop counters, and the train
sampler's host RNG (Lightning ckpt_path resume parity,
reference src/train.py:171, configs/train.yaml:53)."""
import os

import numpy as np
import pytest

from vlp_tpu.config import Config, apply_overrides
from vlp_tpu.data.datamodule import build_datamodule
from vlp_tpu.models.tasks import build_task
from vlp_tpu.train.loop import Trainer


def _cfg(tmp_path):
    cfg = Config()
    cfg = apply_overrides(cfg, [
        "data.name=synthetic_downstream", "data.image_size=32",
        "data.batch_size=8", "data.eval_batch_size=8",
        "data.synthetic_num_samples=24", "model.model=resnet_micro",
        "trainer.max_epochs=5", "trainer.cache_train_embeddings=false",
    ])
    cfg.output_dir = str(tmp_path)
    return cfg


def _make_trainer(cfg, ckpt_dir):
    dm = build_datamodule(cfg)
    fold = next(dm.folds())
    task = build_task(cfg, fold.statics)
    return Trainer(cfg, task, fold.train_loader, fold.val_loaders,
                   checkpoint_dir=str(ckpt_dir))


def _losses(trainer):
    return [(rec["epoch"], rec["train/loss"]) for rec in trainer.sink.history
            if "train/loss" in rec]


@pytest.mark.slow
def test_resume_is_bitwise_identical(tmp_path):
    cfg = _cfg(tmp_path)

    # straight 5-epoch run
    tr_a = _make_trainer(cfg, tmp_path / "a")
    tr_a.fit()
    full = _losses(tr_a)
    assert [e for e, _ in full] == [0, 1, 2, 3, 4]

    # 3 epochs (same 5-epoch schedule), then resume 2 from the 'last' ckpt
    tr_b = _make_trainer(cfg, tmp_path / "b")
    tr_b.fit(max_epochs=3)
    assert os.path.exists(tmp_path / "b" / "last.meta.json")

    tr_c = _make_trainer(cfg, tmp_path / "c")
    tr_c.load_resume_state(str(tmp_path / "b" / "last"))
    assert tr_c.start_epoch == 3
    assert int(np.asarray(tr_c.state.step)) == int(np.asarray(tr_b.state.step))
    tr_c.fit()
    tail = _losses(tr_c)

    assert [e for e, _ in tail] == [3, 4]
    # BITWISE equality: identical jitted program + restored state/RNGs
    for (ea, la), (ec, lc) in zip(full[3:], tail):
        assert ea == ec
        assert la == lc, (ea, la, lc)

    # resumed params equal straight-run params exactly
    import jax

    pa = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(jax.device_get(tr_a.state.params))}
    pc = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(jax.device_get(tr_c.state.params))}
    assert set(pa) == set(pc)
    for k in pa:
        np.testing.assert_array_equal(np.asarray(pa[k]), np.asarray(pc[k]))


@pytest.mark.slow
def test_best_checkpoint_is_weights_compatible(tmp_path):
    """Full-state best checkpoints must stay readable by weights-only
    consumers (transfer surgery, eval CLIs)."""
    from vlp_tpu.utils import checkpoint as ckpt

    cfg = _cfg(tmp_path)
    tr = _make_trainer(cfg, tmp_path / "ck")
    tr.fit(max_epochs=2)
    best = tr.checkpointer.best_path
    assert best is not None
    tree = ckpt.restore(best, {"params": tr.state.params,
                               "extra_vars": tr.state.extra_vars})
    assert set(tree) == {"params", "extra_vars"}
    raw = ckpt.restore_raw(best)
    assert "opt_state" in raw and "rng_data" in raw

    meta = ckpt.load_meta(best)
    assert meta is not None and "epoch" in meta


def test_weights_only_checkpoint_refuses_full_resume(tmp_path):
    from vlp_tpu.utils import checkpoint as ckpt

    cfg = _cfg(tmp_path)
    tr = _make_trainer(cfg, tmp_path / "w")
    ckpt.save(str(tmp_path / "weights_only"),
              {"params": tr.state.params, "extra_vars": tr.state.extra_vars})
    assert ckpt.load_meta(str(tmp_path / "weights_only")) is None
    with pytest.raises(ValueError, match="weights-only"):
        tr.load_resume_state(str(tmp_path / "weights_only"))


@pytest.mark.slow
def test_fsdp_checkpoint_resume(tmp_path):
    """Resume must work when the state is FSDP-sharded over the mesh:
    checkpoints save sharded arrays, restore lands them back SHARDED, and
    the loss trajectory matches the uninterrupted run."""
    import jax

    from vlp_tpu.parallel.mesh import create_mesh

    def cfg_f():
        return apply_overrides(_cfg(tmp_path), [
            "mesh.param_sharding=fsdp", "trainer.scan_steps=1",
            "data.batch_size=16", "data.eval_batch_size=16",
            "data.synthetic_num_samples=48", "trainer.max_epochs=4",
        ])

    mesh = create_mesh()

    def make(ckpt_dir):
        cfg = cfg_f()
        dm = build_datamodule(cfg, mesh=mesh)
        fold = next(dm.folds())
        # no axis_name: under GSPMD jnp.mean over the sharded batch IS the
        # global mean (pmean/axis_name is only for the shard_map path)
        task = build_task(cfg, fold.statics)
        return Trainer(cfg, task, fold.train_loader, fold.val_loaders,
                       mesh=mesh, checkpoint_dir=str(ckpt_dir))

    tr_a = make(tmp_path / "fa")
    tr_a.fit()
    full = _losses(tr_a)

    tr_b = make(tmp_path / "fb")
    tr_b.fit(max_epochs=2)
    tr_c = make(tmp_path / "fc")
    tr_c.load_resume_state(str(tmp_path / "fb" / "last"))
    assert tr_c.start_epoch == 2
    # restored params remain sharded over 'data'
    specs = [str(x.sharding.spec) for x in jax.tree.leaves(tr_c.state.params)]
    assert any("data" in sp for sp in specs), specs
    tr_c.fit()
    tail = _losses(tr_c)
    for (ea, la), (ec, lc) in zip(full[2:], tail):
        assert ea == ec
        assert la == pytest.approx(lc, rel=1e-5), (ea, la, lc)


@pytest.mark.slow
def test_scanned_trainer_matches_per_step(tmp_path):
    """The scanned K-step Trainer path must train the same model as per-step
    dispatch: identical RNG split sequence per step, so trajectories agree
    to numerical precision (VERDICT r1 #3/#4)."""
    cfg_scan = apply_overrides(_cfg(tmp_path), ["trainer.scan_steps=2",
                                                "trainer.max_epochs=2",
                                                "trainer.precision=fp32"])
    tr_scan = _make_trainer(cfg_scan, tmp_path / "scan")
    assert tr_scan.use_scan
    tr_scan.fit()

    cfg_step = apply_overrides(_cfg(tmp_path), ["trainer.scan_steps=1",
                                                "trainer.max_epochs=2",
                                                "trainer.precision=fp32"])
    tr_step = _make_trainer(cfg_step, tmp_path / "step")
    assert not tr_step.use_scan
    tr_step.fit()

    ls, lp = _losses(tr_scan), _losses(tr_step)
    assert len(ls) == len(lp) == 2
    for (ea, la), (eb, lb) in zip(ls, lp):
        assert ea == eb
        assert la == pytest.approx(lb, rel=1e-4), (ea, la, lb)
    # same number of optimizer steps
    assert int(np.asarray(tr_scan.state.step)) == \
        int(np.asarray(tr_step.state.step))


def test_snapshot_metrics_survive_resume(tmp_path):
    """The best-epoch metric snapshot must ride the checkpoint meta: a
    resumed process starts with an empty sink summary, and if the monitor
    never improves after resume the fold's harvested '{monitor}_best_*'
    metrics would silently vanish from cv_summary.json."""
    cfg = _cfg(tmp_path)
    tr_a = _make_trainer(cfg, tmp_path / "a")
    tr_a.fit(max_epochs=2)
    before = {k: v for k, v in tr_a.sink.summary.items()
              if k.startswith(cfg.trainer.checkpoint_monitor + "_best")}
    assert before, "snapshot never fired in the base run"

    tr_b = _make_trainer(cfg, tmp_path / "b")
    tr_b.load_resume_state(str(tmp_path / "a" / "last"))
    # BEFORE any further epoch, the new sink summary already carries the
    # prior run's best-epoch snapshot (restore() re-logged it)
    after = {k: v for k, v in tr_b.sink.summary.items()
             if k.startswith(cfg.trainer.checkpoint_monitor + "_best")}
    assert after == before
    assert tr_b.snapshot.best == tr_a.snapshot.best


def test_missing_monitor_warns_then_raises(tmp_path):
    """A checkpoint monitor the task never produces must fail loudly
    (Lightning raises; silent no-op checkpointing loses the whole run)."""
    cfg = _cfg(tmp_path)
    cfg.trainer.checkpoint_monitor = "val/typo/nonexistent_metric"
    cfg.trainer.linear_probe_every_n_epochs = 1  # grace = 1 epoch
    tr = _make_trainer(cfg, tmp_path / "m")
    with pytest.raises(ValueError, match="nonexistent_metric"):
        tr.fit(max_epochs=3)


def test_fold_fingerprint_tracks_warm_start_checkpoint_content(tmp_path):
    """A regenerated warm-start checkpoint at the SAME path must change the
    fold fingerprint (round-5 review finding: the path string alone let
    fold{i}.done.json markers trained against OLD weights be silently
    reused after the pretrain was re-run into the same directory)."""
    from vlp_tpu.config import Config
    from vlp_tpu.train.driver import _config_fingerprint

    ckpt = tmp_path / "ckpt" / "epoch000"
    ckpt.mkdir(parents=True)
    (ckpt / "weights.bin").write_bytes(b"old-weights")

    cfg = Config()
    cfg.model.pretrained_ckpt = str(ckpt)
    fp_old = _config_fingerprint(cfg)
    assert fp_old == _config_fingerprint(cfg)  # stable across calls

    # same path, new content (regenerated pretrain) -> new fingerprint
    import os as _os

    (ckpt / "weights.bin").write_bytes(b"new-weights-x")
    _os.utime(ckpt / "weights.bin",
              ns=(_os.stat(ckpt / "weights.bin").st_mtime_ns + 10 ** 9,) * 2)
    assert _config_fingerprint(cfg) != fp_old

    # orchestration-only flags stay excluded
    cfg2 = Config()
    cfg2.model.pretrained_ckpt = str(ckpt)
    cfg2.resume_completed_folds = not cfg2.resume_completed_folds
    cfg2.test = not cfg2.test
    assert _config_fingerprint(cfg2) == _config_fingerprint(cfg)
