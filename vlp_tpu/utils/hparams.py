"""Hyperparameter + parameter-count logging.

Reference src/utils/hyperparam_logging.py:13-58: collects the config plus
total/trainable/non-trainable parameter counts and sends them to all
loggers. Here: config dict + param counts from the train state, where
"non-trainable" means parameters in frozen optimizer groups (lr=0) plus
non-param collections (batch_stats).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from vlp_tpu.config import Config
from vlp_tpu.train.optim import param_group_label_fn
from vlp_tpu.utils.logging import MetricSink


def count_params(tree: Any) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)
                   if hasattr(x, "shape")))


def log_hyperparameters(cfg: Config, params: Any, extra_vars: Dict,
                        sink: MetricSink) -> Dict[str, Any]:
    total = count_params(params)
    frozen = 0
    label_fn = param_group_label_fn(cfg)
    if label_fn is not None:
        m = cfg.model
        frozen_groups = set()
        if m.task == "vision_language":
            for g, lr in (("image", m.image_encoder_lr),
                          ("text", m.text_encoder_lr),
                          ("projection", m.projection_lr)):
                if lr == 0.0:
                    frozen_groups.add(g)
        elif m.freeze_encoder or m.vision_encoder_lr == 0.0:
            frozen_groups.add("backbone")
        if frozen_groups:
            for path, leaf in jax.tree_util.tree_leaves_with_path(params):
                key = "/".join(getattr(k, "key", str(k)) for k in path)
                if label_fn(key) in frozen_groups and hasattr(leaf, "shape"):
                    frozen += int(np.prod(leaf.shape))
    record = {
        "model/params/total": total,
        "model/params/trainable": total - frozen,
        "model/params/non_trainable": frozen + count_params(extra_vars),
        "config": cfg.to_dict(),
    }
    sink.log_summary(record)
    return record
