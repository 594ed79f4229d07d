"""Offline linear-probe evaluation CLI (VLP checkpoints).

Reference scripts/linear_probe_test_eval_downstream.py:421-494: load ONE VLP
checkpoint, freeze it, train a LogisticRegression probe per downstream CV
fold on frozen image-tower features, evaluate each probe on the frozen test
split, and write the same per-subgroup long CSV as test_eval.

Usage:
  python -m vlp_tpu.eval.linear_probe_eval --output-file out.csv \
      --checkpoint ckpt_dir [overrides]
"""
from __future__ import annotations

import argparse
from typing import List, Optional

import jax
import numpy as np

from vlp_tpu.config import Config, apply_overrides
from vlp_tpu.data.datamodule import DownstreamData
from vlp_tpu.eval.subgroup import evaluate_results, predictions_frame
from vlp_tpu.models.tasks import VisionLanguageTask, build_task
from vlp_tpu.parallel.mesh import create_mesh
from vlp_tpu.train.step import make_apply_fn
from vlp_tpu.utils import checkpoint as ckpt
from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _features(fn, variables, loader):
    feats, labels = [], []
    for batch in loader:
        f = np.asarray(jax.device_get(fn(variables, batch)))
        m = np.asarray(jax.device_get(batch["mask"])) > 0
        feats.append(f[m])
        labels.append(np.asarray(jax.device_get(batch["label"]))[m])
    return np.concatenate(feats), np.concatenate(labels)


def main(argv: Optional[List[str]] = None) -> int:
    import sys

    from sklearn.linear_model import LogisticRegression

    argv = list(argv if argv is not None else sys.argv[1:])
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-file", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--max-iter", type=int, default=1000)
    args, overrides = parser.parse_known_args(argv)

    cfg = apply_overrides(Config(), overrides)
    vlp_cfg = apply_overrides(Config(), overrides)
    vlp_cfg.model.task = "vision_language"
    # eval params are always replicated and batches shard the data axis
    # only, so a training override set carrying mesh.model_parallel>1 is
    # deliberately NOT honored here: a 1-D data mesh over all devices uses
    # every chip as a data shard instead of duplicating work on model-axis
    # replicas (restore is sharding-agnostic — Orbax restores to the
    # requested replicated sharding regardless of how the ckpt was saved)
    mesh = create_mesh(cfg.mesh.data_parallel, cfg.mesh.axis_name)
    ds_cfg = Config()
    # a VLP config's `data` is the CAPTION corpus — probe on its
    # downstream_data instead. Branch on the TASK (the property actually
    # meant) like train/driver.py does, with the same synthetic rewrite:
    # name heuristics ("pretrain" in ...) drifted twice already.
    if cfg.model.task == "vision_language":
        import copy as _copy

        ds_cfg.data = _copy.deepcopy(cfg.downstream_data)
        if cfg.data.name.startswith("synthetic"):
            ds_cfg.data.name = "synthetic_downstream"
    else:
        ds_cfg.data = cfg.data
    ds_cfg.mesh = cfg.mesh  # keep user mesh overrides (loader shardings)
    ds_cfg.output_dir = cfg.output_dir
    dm = DownstreamData(ds_cfg, mesh)

    dfs = []
    for fold in [f.index for f in dm.folds()]:
        statics = dm.fold_statics(fold)
        task: VisionLanguageTask = build_task(vlp_cfg, statics)  # type: ignore
        fold_obj = None
        for f in dm.folds():
            if f.index == fold:
                fold_obj = f
                break
        # sampler-free init batch: iterating the loader would start the
        # prefetch thread and advance the shared sampler RNG a timing-
        # dependent amount (same fix as train/loop.py init)
        init_batch = fold_obj.train_loader.init_batch()
        # VLP tasks need pretrain-shaped init batches; synthesize text fields.
        init_batch = dict(init_batch)
        init_batch.setdefault("input_ids", jax.numpy.ones(
            (init_batch["image_u8"].shape[0], vlp_cfg.data.max_token_length),
            jax.numpy.int32))
        init_batch.setdefault("attention_mask",
                              jax.numpy.ones_like(init_batch["input_ids"]))
        variables = task.init_variables(jax.random.key(0), init_batch)
        tree = ckpt.restore(args.checkpoint, {
            "params": variables["params"],
            "extra_vars": {k: v for k, v in variables.items()
                           if k != "params"}})
        variables = {"params": tree["params"], **tree["extra_vars"]}
        fn = make_apply_fn(task.features_fn, mesh, cfg.mesh.axis_name)
        x_tr, y_tr = _features(fn, variables, fold_obj.train_loader)
        clf = LogisticRegression(max_iter=args.max_iter)
        clf.fit(x_tr, y_tr)
        x_te, _ = _features(fn, variables, dm.test_loader(fold))
        probs = clf.predict_proba(x_te)[:, 1]
        dfs.append(predictions_frame(probs, dm.test))
        logger.info("fold %d probe fitted on %d samples", fold, len(y_tr))
    evaluate_results(args.output_file, dfs)
    logger.info("Wrote %s", args.output_file)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
