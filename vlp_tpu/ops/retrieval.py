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
