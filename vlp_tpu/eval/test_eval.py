"""Offline test-set evaluation CLI (supervised checkpoints).

Reference scripts/test_eval_downstream.py:364-445: given one checkpoint per
CV fold, run the frozen combined INTERNAL+BTXRD test split with
fold-matched normalization, collect sigmoid probabilities + metadata, and
write the per-subgroup long-format metric CSV. Also supports saving raw
predictions and the first-N failure images (reference :91-112).

Usage:
  python -m vlp_tpu.eval.test_eval --output-file out.csv \
      --checkpoints ck_fold0 ck_fold1 ck_fold2 ck_fold3 \
      [experiment=... data.*=... overrides] [--save-predictions dir]
      [--torchxrayvision]
"""
from __future__ import annotations

import argparse
import os
import re
from typing import List, Optional

import jax
import numpy as np

from vlp_tpu.config import Config, apply_overrides
from vlp_tpu.data.datamodule import DownstreamData
from vlp_tpu.eval.subgroup import evaluate_results, predictions_frame
from vlp_tpu.models.tasks import build_task
from vlp_tpu.parallel.mesh import create_mesh
from vlp_tpu.train.step import make_eval_step
from vlp_tpu.utils import checkpoint as ckpt
from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def collect_probs(cfg: Config, checkpoint_path: str, dm: DownstreamData,
                  fold: int, mesh, save_failures: Optional[str] = None,
                  max_failures: int = 10):
    """Sigmoid probabilities + metadata rows for the frozen test split with
    fold-specific normalization."""
    statics = dm.fold_statics(fold)
    task = build_task(cfg, statics)
    loader = dm.test_loader(fold)
    # sampler-free init batch (no prefetch-thread RNG advance)
    init_batch = loader.init_batch()
    variables = task.init_variables(jax.random.key(0), init_batch)
    tree = ckpt.restore(checkpoint_path, {
        "params": variables["params"],
        "extra_vars": {k: v for k, v in variables.items() if k != "params"}})
    variables = {"params": tree["params"], **tree["extra_vars"]}
    eval_step = make_eval_step(task, mesh, cfg.mesh.axis_name)
    probs = []
    for batch in loader:
        out = eval_step(variables, batch)
        logits = np.asarray(jax.device_get(out["logits"])).ravel()
        mask = np.asarray(jax.device_get(out["mask"])) > 0
        probs.append(1.0 / (1.0 + np.exp(-logits[mask])))
    probs = np.concatenate(probs)
    df = predictions_frame(probs, dm.test)
    if save_failures:
        _save_failures(df, dm, save_failures, max_failures)
    return df


def _save_failures(df, dm: DownstreamData, out_dir: str, n: int) -> None:
    """Dump the first n misclassified images (reference :91-112)."""
    os.makedirs(out_dir, exist_ok=True)
    wrong = df[(df["prob"] >= 0.5).astype(int) != df["tumor"]]
    try:
        import cv2

        for i, (_, row) in enumerate(wrong.head(n).iterrows()):
            idx = dm._cache_index.get(row["image_path"])
            if idx is None:
                continue
            img = np.asarray(dm.cache.data[idx])
            cv2.imwrite(os.path.join(
                out_dir, f"fail{i}_true{row['tumor']}_p{row['prob']:.2f}.png"),
                img)
    except ImportError:  # pragma: no cover
        logger.warning("cv2 unavailable; skipping failure-image dump")


_OVERRIDE_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*=")


def split_overrides(argv: List[str]) -> tuple:
    """(cli_args, config_overrides): `dotted.key=value` tokens are config
    overrides, everything else is argparse's. Split BEFORE argparse — the
    greedy `--checkpoints` nargs="+" would otherwise swallow a trailing
    `experiment=...` token as another checkpoint path and silently
    evaluate under the DEFAULT config (round-5 verify finding). Only
    tokens whose KEY is a dotted identifier count: a checkpoint path like
    `outputs/sweep/lr=0.001/fold0` contains '=' but has '/' before it,
    so it stays a CLI argument."""
    overrides = [a for a in argv if _OVERRIDE_RE.match(a)]
    return [a for a in argv if a not in overrides], overrides


def main(argv: Optional[List[str]] = None) -> int:
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-file", required=True)
    parser.add_argument("--checkpoints", nargs="+", required=True,
                        help="one checkpoint dir per CV fold")
    parser.add_argument("--save-predictions", default=None)
    parser.add_argument("--save-failures", default=None)
    parser.add_argument("--torchxrayvision", action="store_true",
                        help="1-channel scale-intensity normalization path")
    cli, overrides = split_overrides(argv)
    args = parser.parse_args(cli)

    cfg = apply_overrides(Config(), overrides)
    if args.torchxrayvision:
        cfg.data.in_channels = 1
        cfg.data.scale_intensity_normalization = True
    # 1-D data mesh regardless of mesh.model_parallel overrides: eval
    # params are replicated, so model-axis devices would be pure replicas
    # (see linear_probe_eval.py for the full rationale)
    mesh = create_mesh(cfg.mesh.data_parallel, cfg.mesh.axis_name)
    dm = DownstreamData(cfg, mesh)
    dfs = []
    for fold, path in enumerate(args.checkpoints):
        df = collect_probs(cfg, path, dm, fold, mesh,
                           save_failures=args.save_failures)
        if args.save_predictions:
            os.makedirs(args.save_predictions, exist_ok=True)
            df.to_csv(os.path.join(args.save_predictions,
                                   f"predictions_fold{fold}.csv"), index=False)
        dfs.append(df)
    evaluate_results(args.output_file, dfs)
    logger.info("Wrote %s", args.output_file)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
