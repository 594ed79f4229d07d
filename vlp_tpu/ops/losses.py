"""Loss functions: weighted BCE, CORAL, symmetric InfoNCE (+ deprecated
duplicate-caption variants kept for parity).

All pure jnp functions over batches with optional validity masks (static
shapes + padded batches are the XLA-friendly replacement for the reference's
ragged final batches).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, labels: jax.Array,
                    weights: Optional[jax.Array] = None,
                    mask: Optional[jax.Array] = None) -> jax.Array:
    """Per-sample-weighted binary cross entropy with logits.

    Matches torch BCEWithLogitsLoss(weight=w, reduction='mean') semantics
    (mean of w*loss over batch elements), which the reference builds with
    per-sample weights from class weights (OnlyImagingModule.py:272-276):
    w_i = class_weight[label_i].
    """
    logits = logits.astype(jnp.float32).reshape(-1)
    labels = labels.astype(jnp.float32).reshape(-1)
    # numerically stable: max(x,0) - x*y + log1p(exp(-|x|))
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if weights is not None:
        per = per * weights.reshape(-1)
    if mask is None:
        return per.mean()
    mask = mask.reshape(-1)
    return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def per_sample_class_weights(labels: jax.Array,
                             class_weights: Tuple[float, float]) -> jax.Array:
    """w_i = w1 if label_i==1 else w0."""
    labels = labels.reshape(-1).astype(jnp.float32)
    return labels * class_weights[1] + (1.0 - labels) * class_weights[0]


# --------------------------------------------------------------------------
# CORAL (Deep CORAL covariance alignment)
# --------------------------------------------------------------------------

def _masked_covariance(x: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Covariance over the masked rows of x [N, D], Bessel-corrected (n-1),
    matching the reference compute_covariance (coral.py:18-37):
    C = (XᵀX − n·μμᵀ) / (n−1)."""
    mask = mask.reshape(-1, 1).astype(x.dtype)
    n = mask.sum()
    xm = x * mask
    mean = xm.sum(axis=0, keepdims=True) / jnp.maximum(n, 1.0)  # [1, D]
    dtd = xm.T @ xm  # [D, D]
    c = (dtd - n * (mean.T @ mean)) / jnp.maximum(n - 1.0, 1.0)
    return c, n


def coral_loss(source: jax.Array, target: jax.Array,
               source_mask: Optional[jax.Array] = None,
               target_mask: Optional[jax.Array] = None) -> jax.Array:
    """sum((Cov_s − Cov_t)²) / (4 d²) (reference coral.py:5-15).

    Masked so it works under jit with padded domain subsets; returns 0 when
    either domain has <2 samples — the reference skips CORAL in that case
    at the call site (OnlyImagingModule.py:279-302) because n=1 yields NaN.
    """
    source = source.astype(jnp.float32)
    target = target.astype(jnp.float32)
    d = source.shape[1]
    sm = jnp.ones(source.shape[0]) if source_mask is None else source_mask
    tm = jnp.ones(target.shape[0]) if target_mask is None else target_mask
    cs, ns = _masked_covariance(source, sm)
    ct, nt = _masked_covariance(target, tm)
    loss = jnp.sum((cs - ct) ** 2) / (4.0 * d * d)
    return jnp.where((ns >= 2) & (nt >= 2), loss, 0.0)


# --------------------------------------------------------------------------
# Contrastive (CLIP) losses
# --------------------------------------------------------------------------

def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def clip_logits(image_emb: jax.Array, text_emb: jax.Array,
                logit_scale: jax.Array, scale_max: float = 100.0) -> jax.Array:
    """L2-normalize both towers, scale = clamp(exp(logit_scale), max), then
    logits = img @ txtᵀ * scale (reference VisionLanguageModule.py:441-461)."""
    img = l2_normalize(image_emb.astype(jnp.float32))
    txt = l2_normalize(text_emb.astype(jnp.float32))
    scale = jnp.minimum(jnp.exp(logit_scale), scale_max)
    return img @ txt.T * scale


def _masked_softmax_xent(logits: jax.Array, labels: jax.Array,
                         mask: Optional[jax.Array]) -> jax.Array:
    """Mean CE over valid rows; invalid COLUMNS are masked to -inf so padded
    samples can't act as negatives."""
    if mask is not None:
        col_mask = mask.reshape(1, -1)
        logits = jnp.where(col_mask > 0, logits, -1e9)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(logp, labels.reshape(-1, 1), axis=-1).reshape(-1)
    if mask is None:
        return per.mean()
    m = mask.reshape(-1)
    return (per * m).sum() / jnp.maximum(m.sum(), 1.0)


def symmetric_infonce(logits: jax.Array,
                      mask: Optional[jax.Array] = None) -> jax.Array:
    """(CE(logits) + CE(logitsᵀ))/2 with diagonal targets
    (reference VisionLanguageModule.py:549-553)."""
    n = logits.shape[0]
    labels = jnp.arange(n)
    li = _masked_softmax_xent(logits, labels, mask)
    lt = _masked_softmax_xent(logits.T, labels, mask)
    return (li + lt) / 2.0


def duplicate_caption_mask(caption_ids: jax.Array) -> jax.Array:
    """[B,B] mask: 0 where j is a duplicate caption of i's caption but j!=i
    (those logits are excluded), 1 elsewhere. Reference _get_mask
    (VisionLanguageModule.py:506-530), kept for the deprecated masked-loss
    variant superseded by the NoDuplicateCaptionSampler."""
    same = caption_ids.reshape(-1, 1) == caption_ids.reshape(1, -1)
    eye = jnp.eye(caption_ids.shape[0], dtype=bool)
    return jnp.where(same & ~eye, 0.0, 1.0)


def masked_infonce(logits: jax.Array, caption_ids: jax.Array,
                   mask: Optional[jax.Array] = None) -> jax.Array:
    """Deprecated duplicate-tolerant variant, exact reference semantics
    (VisionLanguageModule.py:546-553): duplicate-caption off-diagonal logits
    are MULTIPLIED BY ZERO — they stay in the softmax as zero-valued logits
    rather than being excluded (-inf would be the cleaner masking, but the
    ablation numbers were produced with logits*mask).

    ``mask`` excludes padded tail rows/columns entirely (the reference's
    ragged torch batches had no padding, so valid-only IS the parity
    behavior)."""
    m = duplicate_caption_mask(caption_ids)
    masked = logits * m
    n = logits.shape[0]
    labels = jnp.arange(n)
    li = _masked_softmax_xent(masked, labels, mask)
    lt = _masked_softmax_xent(masked.T, labels, mask)
    return (li + lt) / 2.0


def non_square_infonce(logits: jax.Array, caption_ids: jax.Array,
                       mask: Optional[jax.Array] = None) -> jax.Array:
    """Deprecated dedup-columns BCE variant, exact reference semantics
    (_compute_non_square_loss :464-504): keep only the FIRST column of each
    duplicate caption group, target[i,u]=1 iff image i's caption == u,
    BCEWithLogits mean over the [B, U] matrix.

    Static-shape formulation (XLA needs fixed shapes; U is data-dependent):
    every column gets a first-occurrence indicator, the BCE grid is weighted
    by it, and the mean divides by B*U = B*sum(indicator). Duplicate columns
    therefore carry ZERO weight — a dense mean would re-weight duplicate
    groups relative to the reference."""
    cid = caption_ids.reshape(-1)
    n = cid.shape[0]
    same = cid.reshape(1, -1) == cid.reshape(-1, 1)  # [j, k] same caption
    # first occurrence of each caption: argmax returns the first True
    is_first = (jnp.argmax(same, axis=1) == jnp.arange(n)).astype(jnp.float32)
    row_w = jnp.ones(n) if mask is None else mask.reshape(-1)
    # padded tail rows repeat EARLIER real rows, so their columns are never
    # first occurrences; rows still need explicit exclusion
    is_first = is_first * row_w
    target = same.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    u = jnp.maximum(is_first.sum(), 1.0)
    rows = jnp.maximum(row_w.sum(), 1.0)
    return (per * is_first.reshape(1, -1)
            * row_w.reshape(-1, 1)).sum() / (rows * u)
