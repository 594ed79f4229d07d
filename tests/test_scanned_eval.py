"""Scanned/chunked evaluation (VERDICT r2 #6): the K-batch scan validation
and feature-extraction paths must produce the same numbers as per-batch
dispatch — metrics, VLP embeddings/losses, and probe features."""
import numpy as np
import pytest

from vlp_tpu.config import apply_overrides, get_experiment
from vlp_tpu.data.datamodule import build_datamodule
from vlp_tpu.models.tasks import build_task
from vlp_tpu.train.loop import Trainer


def _trainer(cfg):
    dm = build_datamodule(cfg, mesh=None)
    fold = next(dm.folds())
    task = build_task(cfg, fold.statics)
    return Trainer(cfg, task, fold.train_loader, fold.val_loaders), fold


def _cfg(name, scan_steps, extra=()):
    cfg = get_experiment(name)
    cfg = apply_overrides(cfg, [
        "model.model=resnet_micro",
        "data.image_size=32", "data.batch_size=8", "data.eval_batch_size=8",
        "data.synthetic_num_samples=40",
        f"trainer.scan_steps={scan_steps}",
        *extra,
    ])
    return cfg


@pytest.mark.slow
def test_classifier_scanned_validation_matches_per_batch():
    vals = {}
    for k in (1, 2):
        t, _ = _trainer(_cfg("smoke_synthetic_only_imaging", k))
        assert bool(t.eval_scan_k) == (k > 1)
        vals[k] = t._validate(epoch=0)
    assert set(vals[1]) == set(vals[2])
    for key in vals[1]:
        assert vals[1][key] == pytest.approx(vals[2][key], abs=1e-5), key


@pytest.mark.slow
def test_vlp_scanned_validation_matches_per_batch():
    vals = {}
    for k in (1, 2):
        cfg = _cfg("smoke_synthetic_pretrain", k, extra=[
            "model.text_model=microbert", "data.max_token_length=8"])
        t, _ = _trainer(cfg)
        vals[k] = t._validate(epoch=0)
    assert set(vals[1]) == set(vals[2])
    for key in vals[1]:
        assert vals[1][key] == pytest.approx(vals[2][key], abs=1e-4), key


@pytest.mark.slow
def test_scanned_feature_extraction_matches():
    feats = {}
    for k in (1, 2):
        t, fold = _trainer(_cfg("smoke_synthetic_only_imaging", k))
        loader = next(iter(fold.val_loaders.values()))
        feats[k] = t.extract_features(loader)
    np.testing.assert_allclose(feats[1][0], feats[2][0], atol=1e-5)
    np.testing.assert_array_equal(feats[1][1], feats[2][1])


@pytest.mark.slow
def test_vlp_train_retrieval_cache_rides_the_scan():
    """cache_train_embeddings no longer forces per-step dispatch: the
    scanned path must produce the same train-epoch retrieval metrics as
    per-step dispatch (embeddings stacked out of the scan, masked top-k on
    device — reference VisionLanguageModule.py:685-700)."""
    vals = {}
    for k in (1, 2):
        cfg = _cfg("smoke_synthetic_pretrain", k, extra=[
            "model.text_model=microbert", "data.max_token_length=8",
            "trainer.cache_train_embeddings=true"])
        t, _ = _trainer(cfg)
        assert t.use_scan == (k > 1)
        t._train_epoch(0)
        vals[k] = t._train_retrieval_metrics()
    assert any(key.startswith("train/recall_at_") for key in vals[2]), vals[2]
    assert set(vals[1]) == set(vals[2])
    for key in vals[1]:
        assert vals[1][key] == pytest.approx(vals[2][key], abs=1e-4), key
