#!/usr/bin/env python
"""Full-matrix rehearsal: the thesis deliverable end-to-end, unattended.

The reference's headline output is the 9-experiment x 4-fold results table
(reference README.md:138-150, produced manually via training runs + the
Evaluation notebooks). This script rehearses the WHOLE pipeline at synthetic
smoke scale in ONE command:

    python scripts/rehearse_matrix.py --out outputs/rehearsal

flow per row: driver train() -> 4-fold CV -> per-fold best checkpoints ->
``test=true`` frozen-test eval (per-subgroup long CSV) ->
``eval/results_table.py`` render -> ``docs/REHEARSAL.md``.

The VLP rows first pretrain a dual tower on synthetic caption data, then
warm-start from its checkpoint through the real encoder-graft path
(train/driver.py _maybe_warm_start). Real full-depth towers are used
(ResNet34/ResNet50 at a reduced image size; NesT-S at its native 224).
Numbers are on synthetic noise — the artifact proves ORCHESTRATION, not
model quality: every row flows through the same driver/CV/frozen-test/
aggregation path a real-data run would use, with zero manual glue.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

# CPU-only, 8 virtual devices: rehearses the sharded path like tests do,
# and must never touch the (shared, single) TPU chip.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_use_thunk_runtime" not in flags:
    flags += " --xla_cpu_use_thunk_runtime=false"  # see tests/conftest.py
if "collective_call_terminate_timeout" not in flags:
    # 1-core host: a device thread starved >40s by a concurrent compile
    # trips the rendezvous hard-abort (see tests/conftest.py)
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=600"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Serialize program execution on the CPU mesh: with async dispatch two
# in-flight programs can interleave their all-reduces across the 8 device
# threads and deadlock the rendezvous (observed hang: 7/8 threads arrive,
# 0% CPU forever despite the raised terminate timeout). On a 1-core host
# synchronous dispatch costs nothing and removes the race class entirely.
try:
    jax.config.update("jax_cpu_enable_async_dispatch", False)
except AttributeError:  # older jaxlib without the flag
    pass

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # runnable without an editable install
    sys.path.insert(0, REPO)

# persistent compile cache: folds/rows share programs (1-core host)
from vlp_tpu.utils.cache import host_scoped_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    host_scoped_cache_dir(os.path.join(REPO, ".jax_cache"), "cpu8"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vlp_tpu.config import get_experiment  # noqa: E402
from vlp_tpu.train.driver import train  # noqa: E402

# The 9 reference matrix rows (reference README.md:120-129) -> our
# registered experiments. (section, experiment label, model label, name)
MATRIX = [
    ("Imaging", "Scratch Baseline", "ResNet34",
     "baseline_only_imaging_resnet34"),
    ("Imaging", "Scratch Baseline", "NesT-S",
     "baseline_only_imaging_nest_small"),
    ("Imaging", "VLP Linear Probe (ours)", "ResNet34",
     "vlp_linear_probe_resnet34"),
    ("Imaging", "VLP Finetune (ours)", "ResNet34",
     "vlp_finetune_only_imaging_resnet34"),
    ("Imaging", "Torchxrayvision Finetune", "ResNet50",
     "baseline_only_imaging_xrv_resnet50"),
    ("Imaging+Clinical", "Scratch Baseline", "ResNet34",
     "baseline_fusion_resnet34"),
    ("Imaging+Clinical", "Scratch Baseline", "NesT-S",
     "baseline_fusion_nest_small"),
    ("Imaging+Clinical", "VLP Finetune (ours)", "ResNet34",
     "vlp_finetune_fusion_resnet34"),
    ("Imaging+Clinical", "Torchxrayvision Finetune", "ResNet50",
     "fusion_xrv_resnet50"),
]

PRETRAIN_EXPERIMENT = "pretrain_resnet34_distilbert"


def smoke_scale(cfg, out_dir: str, image_size: int, n_samples: int,
                epochs: int):
    """Uniform smoke-scale overrides; every registry-declared knob
    (backbone, monitor, loss_variant, lr, scheduler, ...) is KEPT."""
    d = cfg.data
    d.name = ("synthetic_pretrain" if cfg.model.task == "vision_language"
              else "synthetic_downstream")
    d.image_size = image_size
    d.batch_size = min(d.batch_size, 8)
    d.eval_batch_size = 8
    d.synthetic_num_samples = n_samples
    if cfg.model.task == "vision_language":
        d.max_token_length = 16
        dd = cfg.downstream_data
        dd.name = "synthetic_downstream"
        dd.image_size = image_size
        dd.batch_size = 8
        dd.eval_batch_size = 8
        dd.synthetic_num_samples = 32
    cfg.trainer.max_epochs = epochs
    cfg.trainer.scan_steps = 2
    cfg.trainer.linear_probe_every_n_epochs = 1
    cfg.output_dir = out_dir
    return cfg


def _row_marker(run_dir: str) -> str:
    return os.path.join(run_dir, "rehearsal_done.json")


def _load_marker(path: str):
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def _write_marker(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=2)
    os.replace(tmp, path)  # atomic: a kill mid-write can't fake completion


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(REPO, "outputs",
                                                 "rehearsal"))
    p.add_argument("--image-size", type=int, default=64,
                   help="ResNet rows' image size (NesT-S is fixed at 224)")
    p.add_argument("--samples", type=int, default=96,
                   help="synthetic downstream samples (25%% become the "
                        "frozen test split; rest 4-fold CV)")
    p.add_argument("--nest-samples", type=int, default=48,
                   help="sample count for the 224px NesT rows")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--doc", default=os.path.join(REPO, "docs",
                                                 "REHEARSAL.md"))
    args = p.parse_args(argv)
    # Normalize: fingerprints (row markers + the driver's per-fold config
    # hash) embed output/checkpoint paths, so `--out outputs/rehearsal` and
    # `--out /root/repo/outputs/rehearsal` must resolve identically or a
    # resume under the other spelling silently re-runs every VLP row.
    args.out = os.path.abspath(args.out)
    args.doc = os.path.abspath(args.doc)
    t_start = time.time()
    os.makedirs(args.out, exist_ok=True)

    # Resume contract (round-4 advisor findings, all three):
    #  - every phase is keyed on an explicit, atomically-written completion
    #    MARKER carrying the invocation fingerprint — never on "some
    #    checkpoint/CSV exists" (a truncated file or an earlier-epoch
    #    interrupted run could otherwise be silently reused);
    #  - re-running with different --samples/--image-size/--epochs (or a
    #    regenerated pretrain checkpoint) invalidates the markers, so one
    #    table can never mix scales;
    #  - WITHIN a row, the driver resumes per fold (cfg.resume_completed_
    #    folds: fold{i}.done.json with a full-config fingerprint), so an
    #    interrupted 4-fold row restarts at its first unfinished fold.
    run_fp = {"image_size": args.image_size, "samples": args.samples,
              "nest_samples": args.nest_samples, "epochs": args.epochs}

    # 1) VLP pretrain at smoke scale -> warm-start checkpoint for the
    #    finetune/linear-probe rows (their pretrained_ckpt is REQUIRED:).
    pre_dir = os.path.join(args.out, "vlp_pretrain")
    pre_marker = _row_marker(pre_dir)
    pre_fp = {"image_size": args.image_size, "samples": 64,
              "epochs": args.epochs}
    done = _load_marker(pre_marker)
    if done and done.get("fingerprint") == pre_fp:
        print(f"[rehearsal] reusing completed pretrain in {pre_dir}",
              flush=True)
    else:
        if done is not None:
            print(f"[rehearsal] pretrain marker args changed "
                  f"({done.get('fingerprint')} != {pre_fp}); re-running",
                  flush=True)
        print(f"[rehearsal] pretraining {PRETRAIN_EXPERIMENT} -> {pre_dir}",
              flush=True)
        cfg = smoke_scale(get_experiment(PRETRAIN_EXPERIMENT), pre_dir,
                          args.image_size, 64, args.epochs)
        cfg.k_fold_cross_validation = False  # one pretrain fold is enough
        cfg.resume_completed_folds = True
        train(cfg)
        _write_marker(pre_marker, {"fingerprint": pre_fp})
    ckpts = sorted(d for d in glob.glob(
        os.path.join(pre_dir, "checkpoints", "fold0", "epoch*"))
        if os.path.isdir(d))
    assert ckpts, "VLP pretrain produced no checkpoint"
    vlp_ckpt = ckpts[-1]
    # identity of the warm-start checkpoint: rows trained against an OLDER
    # pretrain (path or regenerated content) must not be reused
    vlp_ckpt_id = {"path": vlp_ckpt,
                   "mtime": round(os.path.getmtime(vlp_ckpt), 2)}
    print(f"[rehearsal] VLP warm-start checkpoint: {vlp_ckpt}", flush=True)

    # 2) the 9 matrix rows: 4-fold CV + frozen-test eval each.
    spec_rows = []
    for section, label, model, name in MATRIX:
        run_dir = os.path.join(args.out, name)
        spec_rows.append({"section": section, "experiment": label,
                          "model": model, "run_dir": run_dir})
        row_fp = dict(run_fp)
        is_nest = "nest" in name
        cfg = smoke_scale(get_experiment(name), run_dir,
                          224 if is_nest else args.image_size,
                          args.nest_samples if is_nest else args.samples,
                          args.epochs)
        cfg.test = True  # frozen-test eval after CV (driver test=true path)
        cfg.k_fold_cross_validation = True
        cfg.resume_completed_folds = True  # per-fold resume within the row
        if (cfg.model.pretrained_ckpt or "").startswith("REQUIRED:"):
            cfg.model.pretrained_ckpt = vlp_ckpt
            row_fp["vlp_ckpt"] = vlp_ckpt_id
        done = _load_marker(_row_marker(run_dir))
        if done and done.get("fingerprint") == row_fp and \
                os.path.exists(os.path.join(run_dir, "test_eval.csv")):
            print(f"[rehearsal] {name}: reusing completed row in {run_dir}",
                  flush=True)
            continue
        if done is not None:
            why = ("marker args/ckpt changed"
                   if done.get("fingerprint") != row_fp
                   else "test_eval.csv missing")
            print(f"[rehearsal] {name}: {why}; re-running", flush=True)
        print(f"[rehearsal] {section} / {label} / {model}: {name} "
              f"({cfg.data.n_folds_downstream}-fold CV + frozen test)",
              flush=True)
        t0 = time.time()
        agg = train(cfg)
        test_keys = {k: round(v, 4) for k, v in agg.items()
                     if k.startswith("test/")}
        print(f"[rehearsal] {name} done in {time.time()-t0:.0f}s; "
              f"frozen-test: {test_keys}", flush=True)
        assert os.path.exists(os.path.join(run_dir, "test_eval.csv")), \
            f"{name}: driver test=true produced no test_eval.csv"
        _write_marker(_row_marker(run_dir),
                      {"fingerprint": row_fp, "frozen_test": test_keys})

    # 3) render the README-style table through the real tooling.
    import yaml

    spec = {"title": "REHEARSAL — synthetic smoke scale, 4-fold CV, frozen "
                     "test split (orchestration proof, not model quality)",
            "rows": spec_rows}
    spec_path = os.path.join(args.out, "matrix_spec.yaml")
    with open(spec_path, "w") as fh:
        yaml.safe_dump(spec, fh)
    from vlp_tpu.eval import results_table

    md, tidy = results_table.render_markdown(spec)
    tidy.to_csv(os.path.join(args.out, "matrix_tidy.csv"), index=False)

    # 4) the committed artifact.
    os.makedirs(os.path.dirname(args.doc), exist_ok=True)
    cmd = "python scripts/rehearse_matrix.py"
    with open(args.doc, "w") as fh:
        fh.write(f"""# Full-matrix rehearsal (thesis-deliverable dry run)

The reference's final output is a 9-experiment x 4-fold results table
(reference README.md:138-150). This artifact proves the same deliverable
flows through vlp_tpu END TO END — driver -> k-fold CV -> best checkpoints
-> frozen-test eval -> per-subgroup CSV -> aggregated mean±std table — in
one unattended command, with zero manual glue:

```bash
{cmd}
```

Scale: synthetic data ({args.samples} downstream samples, 25% frozen test,
image {args.image_size}px for ResNet rows / 224px native for NesT-S,
{args.epochs} epochs, batch 8, CPU-8 virtual mesh), REAL full-depth towers,
real warm-start graft from a freshly pretrained VLP checkpoint. **The
numbers below are synthetic-noise numbers** — they demonstrate the
orchestration path, not model quality (real datasets are unavailable in
this environment; see STATUS.md).

{md}
Rendered {time.strftime('%Y-%m-%d %H:%M:%S')} (this invocation {time.time()-t_start:.0f}s;
rows completed in earlier invocations of the same command are reused via
fingerprinted per-fold resume — see rehearsal_done.json/fold*.done.json)
on a 1-core CPU host (8 virtual XLA devices). Tidy CSV committed beside
this file (`rehearsal_matrix_tidy.csv`); per-row run dirs (checkpoints,
metrics JSONL, test_eval.csv, plots) under `{args.out}/`.
""")
    # commit-able copy of the tidy CSV next to the doc (outputs/ is ignored)
    import shutil

    shutil.copyfile(os.path.join(args.out, "matrix_tidy.csv"),
                    os.path.join(os.path.dirname(args.doc),
                                 "rehearsal_matrix_tidy.csv"))
    print(md)
    print(f"[rehearsal] artifact -> {args.doc} "
          f"({time.time()-t_start:.0f}s total)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
