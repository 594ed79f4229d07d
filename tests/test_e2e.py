"""End-to-end integration: one tiny fold through the full driver (config ->
synthetic data -> jitted train step -> validation -> checkpoint -> CV
aggregate), and the VLP path with probe + retrieval. Uses 32px images so the
single-core CPU compile stays small; marked slow."""
import glob
import json
import os

import pytest

from vlp_tpu.config import apply_overrides, get_experiment
from vlp_tpu.train.driver import train


@pytest.mark.slow
def test_supervised_e2e(tmp_path):
    cfg = get_experiment("smoke_synthetic_only_imaging")
    cfg = apply_overrides(cfg, [
        "model.model=resnet_micro",
        "data.image_size=32", "data.batch_size=8", "data.eval_batch_size=8",
        "data.synthetic_num_samples=24", "trainer.max_epochs=2",
        "model.coral_lambda=1.0",
    ])
    cfg.output_dir = str(tmp_path)
    agg = train(cfg)
    assert agg["num_folds"] == 1
    key = "val/combined/accuracy_best_val/combined/accuracy_mean"
    assert key in agg and 0.0 <= agg[key] <= 1.0
    # checkpoint exists
    assert glob.glob(str(tmp_path / "checkpoints" / "fold0" / "epoch*"))
    # metrics jsonl written
    lines = open(glob.glob(str(tmp_path / "metrics_fold0.jsonl"))[0]).read()
    assert "train/loss" in lines
    # cv summary
    cv = json.load(open(tmp_path / "cv_summary.json"))
    assert cv == pytest.approx(agg)


@pytest.mark.slow
def test_vlp_e2e_with_probe_and_pak(tmp_path):
    cfg = get_experiment("smoke_synthetic_pretrain")
    cfg = apply_overrides(cfg, [
        "model.model=resnet_micro", "model.text_model=microbert",
        "data.image_size=32", "data.batch_size=8", "data.eval_batch_size=8",
        "data.max_token_length=8", "data.synthetic_num_samples=40",
        "downstream_data.image_size=32",
        "downstream_data.synthetic_num_samples=24",
        "trainer.max_epochs=1",
    ])
    cfg.output_dir = str(tmp_path)
    agg = train(cfg)
    keys = "\n".join(agg)
    assert "linear_probe_balanced_accuracy" in keys
    assert "downstream_entire/label_precision_at_3_mean" in agg
    assert "val/lera/loss" in keys or "val/mura/loss" in keys


@pytest.mark.slow
def test_supervised_learning_signal(tmp_path):
    """Regression guard: the classifier must actually LEARN the synthetic
    tumor signal (val AUROC well above chance within a few epochs)."""
    cfg = get_experiment("smoke_synthetic_only_imaging")
    cfg = apply_overrides(cfg, [
        "model.model=resnet_micro",
        "data.image_size=32", "data.batch_size=16", "data.eval_batch_size=16",
        "data.synthetic_num_samples=128", "trainer.max_epochs=4",
        "optimizer.lr=1e-3", "model.coral_lambda=0.0",
    ])
    cfg.output_dir = str(tmp_path)
    train(cfg)
    hist = [json.loads(l)
            for l in open(tmp_path / "metrics_fold0.jsonl")]
    aurocs = [h["val/combined/auroc"] for h in hist
              if "val/combined/auroc" in h]
    assert max(aurocs) > 0.75, f"no learning signal: AUROCs {aurocs}"


@pytest.mark.slow
def test_vlp_to_classifier_transfer(tmp_path):
    """Full transfer path: pretrain a tiny VLP, then fine-tune an
    OnlyImaging classifier warm-started from its best checkpoint
    (reference OnlyImagingModule.py:75-98 flow)."""
    pre = get_experiment("smoke_synthetic_pretrain")
    pre = apply_overrides(pre, [
        "model.model=resnet_micro", "model.text_model=microbert",
        "data.image_size=32", "data.batch_size=8", "data.eval_batch_size=8",
        "data.max_token_length=8", "data.synthetic_num_samples=24",
        "downstream_data.image_size=32",
        "downstream_data.synthetic_num_samples=32",
        "trainer.max_epochs=1",
    ])
    pre.output_dir = str(tmp_path / "pretrain")
    train(pre)
    ckpts = [p for p in glob.glob(str(tmp_path / "pretrain" / "checkpoints"
                                      / "fold0" / "epoch*"))
             if os.path.isdir(p)]  # skip the .meta.json resume sidecars
    assert ckpts, "VLP produced no checkpoint"

    ft = get_experiment("smoke_synthetic_only_imaging")
    ft = apply_overrides(ft, [
        "model.model=resnet_micro",  # must match the VLP image tower
        "data.image_size=32", "data.batch_size=8", "data.eval_batch_size=8",
        "data.synthetic_num_samples=24", "trainer.max_epochs=1",
        f"model.pretrained_ckpt={ckpts[-1]}",
        "model.vision_encoder_lr=1e-5",  # split-LR fine-tune variant
    ])
    ft.output_dir = str(tmp_path / "finetune")
    agg = train(ft)
    assert agg["num_folds"] == 1  # ran through with the grafted encoder


@pytest.mark.slow
def test_xrv_style_one_channel_path(tmp_path):
    """torchxrayvision-style data path end-to-end: 1-channel input +
    scale-intensity normalization (0..255 -> -1024..1024). Uses the micro
    backbone for CPU compile speed; the resnet50-res512-all weight-import
    path itself (incl. the zero-egress random fallback) is covered by
    tests/test_torch_import.py."""
    cfg = get_experiment("smoke_synthetic_only_imaging")
    cfg = apply_overrides(cfg, [
        "model.model=resnet_micro",
        "data.in_channels=1", "data.scale_intensity_normalization=true",
        "data.image_size=32", "data.batch_size=8", "data.eval_batch_size=8",
        "data.synthetic_num_samples=24", "trainer.max_epochs=1",
    ])
    cfg.output_dir = str(tmp_path)
    agg = train(cfg)
    assert agg["num_folds"] == 1
    assert "val/combined/accuracy_best_val/combined/accuracy_mean" in agg


@pytest.mark.slow
def test_fsdp_sharded_training_e2e(tmp_path):
    """Driver flow with mesh.param_sharding=fsdp: params + optimizer moments
    sharded over the data axis; checkpoints, validation and plots must all
    work on sharded state. scan_steps=1 because the CPU SPMD partitioner
    compiles scanned FSDP programs very slowly (config NOTE)."""
    cfg = get_experiment("smoke_synthetic_only_imaging")
    cfg = apply_overrides(cfg, [
        "model.model=resnet_micro", "mesh.param_sharding=fsdp",
        "trainer.scan_steps=1",
        "data.image_size=32", "data.batch_size=16", "data.eval_batch_size=16",
        "data.synthetic_num_samples=48", "trainer.max_epochs=2",
    ])
    cfg.output_dir = str(tmp_path)
    agg = train(cfg)
    assert agg["num_folds"] == 1
    assert "val/combined/accuracy_best_val/combined/accuracy_mean" in agg


@pytest.mark.slow
def test_training_is_deterministic(tmp_path):
    """Same config + seed twice -> identical loss trajectory (PRNG
    threading, sampler seeding, and the device pipeline are deterministic)."""
    def run(out):
        cfg = get_experiment("smoke_synthetic_only_imaging")
        cfg = apply_overrides(cfg, [
            "model.model=resnet_micro",
            "data.image_size=32", "data.batch_size=8",
            "data.eval_batch_size=8", "data.synthetic_num_samples=24",
            "trainer.max_epochs=2",
        ])
        cfg.output_dir = str(out)
        train(cfg)
        hist = [json.loads(l) for l in open(out / "metrics_fold0.jsonl")]
        return [h["train/loss"] for h in hist if "train/loss" in h]

    a = run(tmp_path / "a")
    b = run(tmp_path / "b")
    assert a == b, f"nondeterministic training: {a} vs {b}"
