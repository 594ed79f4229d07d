"""Epoch-level retrieval metrics: label precision@k and image→text recall@k.

Same semantics as the reference (VisionLanguageModule.py:364-439):
- precision@k: cosine top-(k+1) over image-image sims, drop the first hit
  (self), fraction of remaining k sharing the query's label, averaged.
- recall@k: aligned image→text sims; fraction of rows whose own index is in
  the top-k.

Jitted top-k over the full embedding matrix; for data-parallel use the
embeddings are all-gathered first (they are tiny: [N, 128]).
"""
from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from vlp_tpu.ops.losses import l2_normalize


@functools.partial(jax.jit, static_argnames=("ks",))
def label_precision_at_k(image_embeddings: jax.Array, labels: jax.Array,
                         ks: Sequence[int] = (3, 5, 10, 15)) -> Dict[int, jax.Array]:
    n = image_embeddings.shape[0]
    assert all(k + 1 <= n for k in ks), "k+1 must be <= number of samples"
    emb = l2_normalize(image_embeddings.astype(jnp.float32))
    sims = emb @ emb.T  # [N, N]
    out = {}
    kmax = max(ks)
    _, idx = jax.lax.top_k(sims, kmax + 1)  # [N, kmax+1], col 0 ~ self
    neighbor_labels = labels[idx[:, 1:]]  # [N, kmax]
    match = (neighbor_labels == labels.reshape(-1, 1)).astype(jnp.float32)
    for k in ks:
        out[k] = match[:, :k].mean(axis=1).mean()
    return out


@functools.partial(jax.jit, static_argnames=("ks",))
def masked_label_precision_at_k(
        image_embeddings: jax.Array, labels: jax.Array, mask: jax.Array,
        ks: Sequence[int] = (3, 5, 10, 15)) -> Dict[int, jax.Array]:
    """Padding-aware precision@k: rows/cols with ``mask == 0`` are excluded
    (padded tail entries of scanned eval chunks). Lets the val epoch keep
    the FULL padded [N_pad, E] embedding buffer on device — no host-side
    boolean filtering — matching ``label_precision_at_k`` on the compacted
    rows exactly (tests/test_ops.py). Caller must ensure the number of
    VALID rows is >= max(ks) + 1 (same contract as the unmasked version's
    shape assert, which cannot be expressed on a traced mask)."""
    valid = mask.reshape(-1) > 0
    emb = l2_normalize(image_embeddings.astype(jnp.float32))
    sims = emb @ emb.T
    # padded columns can never enter anyone's top-k; finfo.min (not -inf:
    # -inf - -inf = NaN hazards under top_k tie-breaking on some backends)
    sims = jnp.where(valid[None, :], sims, jnp.finfo(jnp.float32).min)
    kmax = max(ks)
    _, idx = jax.lax.top_k(sims, kmax + 1)  # col 0 ~ self for valid rows
    neighbor_labels = labels[idx[:, 1:]]
    match = (neighbor_labels == labels.reshape(-1, 1)).astype(jnp.float32)
    row_w = valid.astype(jnp.float32)
    denom = jnp.maximum(row_w.sum(), 1.0)
    return {k: (match[:, :k].mean(axis=1) * row_w).sum() / denom for k in ks}


@functools.partial(jax.jit, static_argnames=("ks",))
def masked_image_text_recall_at_k(
        image_embeddings: jax.Array, text_embeddings: jax.Array,
        mask: jax.Array,
        ks: Sequence[int] = (3, 5, 10, 15)) -> Dict[int, jax.Array]:
    """Padding-aware recall@k over ALIGNED (image_i, text_i) pairs: padded
    rows contribute neither as queries nor as gallery columns. Equal to
    ``image_text_recall_at_k`` on the compacted rows: row/col i of the
    padded sims matrix IS pair i, so masking columns and weighting rows
    preserves every valid query's candidate set and target index."""
    valid = mask.reshape(-1) > 0
    img = l2_normalize(image_embeddings.astype(jnp.float32))
    txt = l2_normalize(text_embeddings.astype(jnp.float32))
    sims = img @ txt.T
    sims = jnp.where(valid[None, :], sims, jnp.finfo(jnp.float32).min)
    n = sims.shape[0]
    targets = jnp.arange(n).reshape(-1, 1)
    kmax = max(ks)
    _, idx = jax.lax.top_k(sims, kmax)
    row_w = valid.astype(jnp.float32)
    denom = jnp.maximum(row_w.sum(), 1.0)
    out = {}
    for k in ks:
        hit = (idx[:, :k] == targets).any(axis=1).astype(jnp.float32)
        out[k] = (hit * row_w).sum() / denom
    return out


@functools.partial(jax.jit, static_argnames=("ks",))
def image_text_recall_at_k(image_embeddings: jax.Array,
                           text_embeddings: jax.Array,
                           ks: Sequence[int] = (3, 5, 10, 15)) -> Dict[int, jax.Array]:
    img = l2_normalize(image_embeddings.astype(jnp.float32))
    txt = l2_normalize(text_embeddings.astype(jnp.float32))
    sims = img @ txt.T
    n = sims.shape[0]
    targets = jnp.arange(n).reshape(-1, 1)
    out = {}
    kmax = max(ks)
    _, idx = jax.lax.top_k(sims, kmax)
    for k in ks:
        hit = (idx[:, :k] == targets).any(axis=1)
        out[k] = hit.astype(jnp.float32).mean()
    return out
