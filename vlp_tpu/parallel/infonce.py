"""Explicit shard_map global-batch InfoNCE.

Default path: the VLP loss computes ``img @ txt.T`` on batch-sharded
embeddings under pjit and GSPMD inserts the all-gather (embeddings are tiny:
[B,128], so the gather is negligible on ICI). This module provides the
EXPLICIT equivalent for (a) validation of the GSPMD path, (b) the chunked
formulation that materializes only the local [B_local, B_global] block of
the logits matrix — the ring-attention-style trick applied to the
contrastive matrix (SURVEY.md §5 long-context note) which matters when the
global batch grows to the point where [B,B] logits dominate memory.

Positions are labels: after all-gather, sample i on shard s has global index
s*B_local+i, so caption uniqueness must hold GLOBALLY — the
NoDuplicateCaptionSampler builds global batches before sharding, preserving
the invariant.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from vlp_tpu.ops.losses import l2_normalize


def _local_infonce(img: jax.Array, txt: jax.Array, scale: jax.Array,
                   mask: jax.Array, axis_name: str) -> jax.Array:
    """Per-shard body: all-gather the (normalized) embeddings, compute the
    local row-block of the global logits, CE against global diagonal."""
    b_local = img.shape[0]
    my = jax.lax.axis_index(axis_name)
    img_n = l2_normalize(img.astype(jnp.float32))
    txt_n = l2_normalize(txt.astype(jnp.float32))
    # ONE all_gather bind for all three operands: independent collectives
    # in a shard_map body have no mutual ordering on the XLA:CPU thunk
    # executor — device threads picking different orders deadlock the
    # rendezvous (observed on the CPU-8 dryrun). A single bind is also one
    # fewer collective on real ICI.
    txt_all, img_all, mask_all = jax.lax.all_gather(
        (txt_n, img_n, mask), axis_name, tiled=True)  # [B_g, E] x2, [B_g]

    labels = my * b_local + jnp.arange(b_local)  # global diag indices

    def row_ce(q, keys):  # q: [b_local, E] vs keys: [B_g, E]
        logits = (q @ keys.T) * scale  # [b_local, B_g]
        logits = jnp.where(mask_all[None, :] > 0, logits, -1e9)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return (per * mask).sum()

    # image->text on local image rows; text->image on local text rows
    loss_i = row_ce(img_n, txt_all)
    loss_t = row_ce(txt_n, img_all)
    # single psum bind (same collective-ordering hazard as above)
    total, count = jax.lax.psum((loss_i + loss_t, mask.sum()), axis_name)
    return total / (2.0 * jnp.maximum(count, 1.0))


def global_infonce_shard_map(mesh: Mesh, axis_name: str = "data"):
    """Returns fn(img_emb, txt_emb, scale, mask) with batch-sharded inputs
    computing the exact global-batch symmetric InfoNCE without ever
    materializing the full [B_g, B_g] matrix on one shard."""

    body = functools.partial(_local_infonce, axis_name=axis_name)
    kwargs = dict(mesh=mesh,
                  in_specs=(P(axis_name), P(axis_name), P(), P(axis_name)),
                  out_specs=P())
    try:
        return shard_map(body, check_vma=False, **kwargs)  # jax >= 0.8
    except TypeError:  # pragma: no cover - older jax
        return shard_map(body, check_rep=False, **kwargs)
