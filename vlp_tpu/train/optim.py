"""Optimizers, LR schedules, and parameter-group policies (optax).

Reference equivalents:
- configs/optimizer/{adamw,adam}.yaml — AdamW/Adam lr 1e-3 partial factories.
- configs/scheduler/*: CosineAnnealingLR(T_max=max_epochs), transformers
  cosine-with-warmup (4 warmup epochs), none. Lightning steps schedulers per
  EPOCH; here schedules are per-step functions quantized to epoch
  granularity so the LR trajectory matches.
- Param groups: OnlyImaging/Fusion optionally split backbone vs head LR
  (reference FusionModule.py:126-196 ``vision_encoder_lr``);
  VisionLanguageModule builds image/text/projection groups where lr=0
  freezes the group entirely (reference VisionLanguageModule.py:186-297).
  Implemented with optax.multi_transform over param-path labels; frozen
  groups get optax.set_to_zero() (no update, no optimizer state growth).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import optax

from vlp_tpu.config import Config


def make_schedule(base_lr: float, cfg: Config, steps_per_epoch: int):
    name = cfg.scheduler.name
    max_epochs = max(cfg.trainer.max_epochs, 1)
    if name in (None, "none", "no_scheduler"):
        return base_lr
    if name == "cosine":
        # CosineAnnealingLR(T_max=max_epochs), stepped per epoch
        def sched(step):
            import jax.numpy as jnp

            epoch = jnp.minimum(step // steps_per_epoch, max_epochs)
            return base_lr * 0.5 * (1 + jnp.cos(jnp.pi * epoch / max_epochs))

        return sched
    if name == "cosine_warmup":
        warmup = cfg.scheduler.warmup_epochs

        def sched(step):
            import jax.numpy as jnp

            epoch = step / steps_per_epoch
            warm = base_lr * jnp.minimum(epoch / jnp.maximum(warmup, 1e-8), 1.0)
            progress = jnp.clip((epoch - warmup) / jnp.maximum(
                max_epochs - warmup, 1e-8), 0.0, 1.0)
            cos = base_lr * 0.5 * (1 + jnp.cos(jnp.pi * progress))
            return jnp.where(epoch < warmup, warm, cos)

        return sched
    raise ValueError(f"unknown scheduler {name!r}")


def _base_tx(cfg: Config, lr) -> optax.GradientTransformation:
    o = cfg.optimizer
    if o.name == "adamw":
        return optax.adamw(lr, b1=o.b1, b2=o.b2, eps=o.eps,
                           weight_decay=o.weight_decay)
    if o.name == "adam":
        return optax.adam(lr, b1=o.b1, b2=o.b2, eps=o.eps)
    if o.name == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer {o.name!r}")


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def param_group_label_fn(cfg: Config) -> Optional[Callable[[str], str]]:
    """Maps a param path string to a group label, or None when a single
    group suffices."""
    m = cfg.model
    if m.task == "vision_language":
        if (m.image_encoder_lr is None and m.text_encoder_lr is None
                and m.projection_lr is None):
            return None

        def label(path: str) -> str:
            if path.startswith("image_encoder/"):
                return "image"
            if path.startswith("text_encoder/"):
                return "text"
            return "projection"  # projections + logit_scale

        return label
    if m.vision_encoder_lr is not None or m.freeze_encoder:
        def label(path: str) -> str:
            # backbone vs heads: reference splits on 'classifier'/'fc'/'head'
            # name membership (FusionModule.py:126-196)
            return "backbone" if path.startswith("backbone/") else "head"

        return label
    return None


def make_optimizer(cfg: Config, params, steps_per_epoch: int
                   ) -> optax.GradientTransformation:
    label_fn = param_group_label_fn(cfg)
    base_lr = cfg.optimizer.lr
    if label_fn is None:
        return _base_tx(cfg, make_schedule(base_lr, cfg, steps_per_epoch))

    m = cfg.model
    if m.task == "vision_language":
        group_lrs: Dict[str, Optional[float]] = {
            "image": m.image_encoder_lr if m.image_encoder_lr is not None else base_lr,
            "text": m.text_encoder_lr if m.text_encoder_lr is not None else base_lr,
            "projection": m.projection_lr if m.projection_lr is not None else base_lr,
        }
    else:
        enc_lr = 0.0 if m.freeze_encoder else (
            m.vision_encoder_lr if m.vision_encoder_lr is not None else base_lr)
        group_lrs = {"backbone": enc_lr, "head": base_lr}

    transforms = {}
    for g, lr in group_lrs.items():
        if lr == 0.0 or lr is None:
            # frozen group (reference removes lr-0 groups entirely,
            # VisionLanguageModule.py:186-297)
            transforms[g] = optax.set_to_zero()
        else:
            transforms[g] = _base_tx(cfg, make_schedule(lr, cfg, steps_per_epoch))

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: label_fn(_path_str(path)), params)
    return optax.multi_transform(transforms, labels)
