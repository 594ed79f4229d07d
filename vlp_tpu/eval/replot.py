"""Retrospective re-plotting batch job.

Reference src/helper_scripts/plot_tsne_for_all_runs_retrospectively.py:19-60
iterates all wandb runs, finds their best checkpoints, and regenerates
t-SNE/confusion plots. Offline equivalent: walk an outputs/ tree, find every
``checkpoints/fold*/`` best checkpoint, rebuild the datamodule from the
run's recorded config, and regenerate the plots next to the run.

Usage: python -m vlp_tpu.eval.replot outputs/ [overrides...]
"""
from __future__ import annotations

import glob
import os
from typing import List, Optional

import jax
import numpy as np

from vlp_tpu.config import Config, apply_overrides
from vlp_tpu.data.datamodule import DownstreamData
from vlp_tpu.eval.plotting import plot_confusion_matrix, plot_tsne_and_silhouette
from vlp_tpu.models.tasks import build_task
from vlp_tpu.parallel.mesh import create_mesh
from vlp_tpu.train.step import make_apply_fn, make_eval_step
from vlp_tpu.utils import checkpoint as ckpt
from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def replot_run(run_dir: str, cfg: Config, mesh) -> List[str]:
    written = []
    dm = DownstreamData(cfg, mesh)
    for fold_dir in sorted(glob.glob(os.path.join(run_dir, "checkpoints",
                                                  "fold*"))):
        fold = int(os.path.basename(fold_dir).removeprefix("fold"))
        ckpts = sorted(p for p in glob.glob(os.path.join(fold_dir, "epoch*"))
                       if os.path.isdir(p))  # skip .meta.json sidecars
        if not ckpts:
            continue
        best = ckpts[-1]
        statics = dm.fold_statics(fold)
        task = build_task(cfg, statics)
        fold_obj = next(f for f in dm.folds() if f.index == fold)
        # sampler-free init batch: iterating the loader would start the
        # prefetch thread and advance the shared sampler RNG a timing-
        # dependent amount (same fix as train/loop.py init)
        init_batch = fold_obj.train_loader.init_batch()
        variables = task.init_variables(jax.random.key(0), init_batch)
        tree = ckpt.restore(best, {
            "params": variables["params"],
            "extra_vars": {k: v for k, v in variables.items()
                           if k != "params"}})
        variables = {"params": tree["params"], **tree["extra_vars"]}
        feat_fn = make_apply_fn(task.features_fn, mesh, cfg.mesh.axis_name)
        eval_step = make_eval_step(task, mesh, cfg.mesh.axis_name)
        feats, labels, datasets, probs = [], [], [], []
        for name, loader in fold_obj.val_loaders.items():
            for batch in loader:
                m = np.asarray(jax.device_get(batch["mask"])) > 0
                feats.append(np.asarray(jax.device_get(
                    feat_fn(variables, batch)))[m])
                labels.append(np.asarray(jax.device_get(batch["label"]))[m])
                datasets.extend([name] * int(m.sum()))
                logits = np.asarray(jax.device_get(
                    eval_step(variables, batch)["logits"])).ravel()[m]
                probs.append(1 / (1 + np.exp(-logits)))
        if not feats:
            continue
        plot_dir = os.path.join(run_dir, "plots", f"fold{fold}")
        p1 = os.path.join(plot_dir, "tsne_val_retro.png")
        plot_tsne_and_silhouette(np.concatenate(feats), np.concatenate(labels),
                                 datasets, p1)
        p2 = os.path.join(plot_dir, "confusion_val_retro.png")
        plot_confusion_matrix(np.concatenate(probs), np.concatenate(labels), p2)
        written += [p1, p2]
    return written


def main(argv: Optional[List[str]] = None) -> int:
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    root = argv[0]
    cfg = apply_overrides(Config(), argv[1:])
    # 1-D data mesh regardless of mesh.model_parallel overrides: eval
    # params are replicated, so model-axis devices would be pure replicas
    # (see linear_probe_eval.py for the full rationale)
    mesh = create_mesh(cfg.mesh.data_parallel, cfg.mesh.axis_name)
    runs = [d for d in glob.glob(os.path.join(root, "*"))
            if os.path.isdir(os.path.join(d, "checkpoints"))] or [root]
    for run in runs:
        cfg.output_dir = run
        written = replot_run(run, cfg, mesh)
        logger.info("%s: wrote %d plots", run, len(written))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
