"""Sequence parallelism (SP) over a 'seq' mesh axis — by GSPMD annotation.

The reference has no distributed code at all (SURVEY.md §2: every run is
one GPU), so like DP/FSDP/TP/PP this is a NEW capability. SP shards the
TOKEN dimension of transformer activations: LayerNorm and the MLP are
token-wise, so they partition cleanly with zero communication; only
attention contracts over tokens, so XLA inserts the all-gather (for K/V)
and the matching reduce/scatter in the backward around exactly those
matmuls. It is the axis to reach for when the activation footprint of
long sequences — not the weights — is what outgrows a chip.

TPU-native design (annotation, not manual collectives — the same recipe
as TP in parallel/mesh.py):

- A 2-D ('data', 'seq') mesh: batch shards over 'data', tokens over
  'seq', weights replicated.
- ``make_seq_parallel_fn`` re-applies one
  ``lax.with_sharding_constraint`` on the [B, T, D] activation between
  blocks; GSPMD propagates token sharding through the LN/MLP interior
  and places the collectives around the attention score/value matmuls.
  No model changes, no shard_map, no manual ppermute.
- On any non-1-D mesh the Mosaic kernel gate (ops/kernel_gate.py)
  already falls every Pallas kernel back to its XLA path, which is what
  GSPMD partitions — enforced inside set_kernel_mesh, so SP composes
  with the fused blocks' fallbacks by construction.

At THIS repo's sequence lengths (text towers cap at 64 tokens,
config/core.py; ViT-L/16 at 224px is 197 tokens) SP is a capability
with tests + dryrun proof, not a win: the all-gather per attention
dwarfs the saved activation memory at T~200. DESIGN.md §4 states the
crossover honestly (SP pays off at T in the thousands — long-document
text towers or high-resolution ViTs).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_seq_mesh(seq_parallel: int, data_parallel: int = 1,
                    devices=None) -> Mesh:
    """A 2-D ('data', 'seq') mesh. Always 2-D (data axis may be size 1)
    so the kernel gate's non-1-D quarantine applies: Mosaic kernels take
    their XLA fallbacks, which GSPMD partitions over the token axis."""
    devices = list(devices if devices is not None else jax.devices())
    need = seq_parallel * data_parallel
    if need > len(devices):
        raise ValueError(
            f"seq mesh needs {data_parallel}x{seq_parallel}="
            f"{need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data_parallel, seq_parallel)
    return Mesh(arr, ("data", "seq"))


def token_sharding(mesh: Mesh, data_axis: str = "data",
                   seq_axis: str = "seq") -> NamedSharding:
    """Sharding for a [B, T, D] activation: batch over 'data', tokens
    over 'seq', features replicated."""
    return NamedSharding(mesh, P(data_axis, seq_axis))


def make_seq_parallel_fn(apply_fn: Callable, mesh: Mesh,
                         data_axis: str = "data",
                         seq_axis: str = "seq") -> Callable:
    """Build ``fn(params_list, x) -> y`` applying a homogeneous block
    stack with token-sharded activations.

    ``apply_fn(p, h) -> h'`` applies ONE block to a [B, T, D] activation
    (shape/dtype-preserving). ``params_list`` is a static sequence of
    per-block param trees (replicated). The returned fn is meant to run
    under ``jax.jit``: the sharding constraint between blocks pins the
    token-parallel layout, and GSPMD confines the collectives to the
    attention contractions. T must divide the 'seq' axis size.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if seq_axis not in sizes:
        raise ValueError(f"mesh has no {seq_axis!r} axis: {sizes}")
    n_seq = sizes[seq_axis]
    sh = token_sharding(mesh, data_axis, seq_axis)

    def fn(params_list: Sequence, x):
        if x.ndim != 3:
            raise ValueError(f"expected [B, T, D], got shape {x.shape}")
        if x.shape[1] % n_seq:
            raise ValueError(
                f"T={x.shape[1]} not divisible by {seq_axis} axis "
                f"size {n_seq}")
        x = lax.with_sharding_constraint(x, sh)
        for p in params_list:
            x = apply_fn(p, x)
            x = lax.with_sharding_constraint(x, sh)
        return x

    return fn
