"""Pipeline parallelism (GPipe schedule) over a 'stage' mesh axis.

The reference has no distributed code at all (SURVEY.md §2: every run is
one GPU), so like DP/FSDP/TP this is a NEW capability. It completes the
sharding axes: pp is what you reach for when one model's layers do not
fit a chip even TP-sharded — stages hold disjoint slices of the layer
stack, activations ride ICI between neighbors once per microbatch.

TPU-native design (the scaling-book pipelining recipe, not a port):

- Per-stage parameters are STACKED on a leading stage dim and sharded
  ``P('stage')`` — each device materializes only its own stage's blocks.
- The schedule is a ``lax.scan`` over ticks inside ``shard_map``: every
  tick each stage applies its blocks to the activation it holds, then
  hands the result to its ring neighbor with a single ``ppermute``.
  Stage 0 ingests microbatch ``t`` at tick ``t``; stage ``s`` processes
  it at tick ``t+s``; the last stage finishes it at tick ``t+n-1``.
  ``M`` microbatches drain in ``M+n-1`` ticks (bubble fraction
  ``(n-1)/(M+n-1)``).
- The last stage's finished microbatches are replicated back with one
  masked ``psum`` (every other stage contributes zeros), so the caller
  sees an ordinary stage-replicated ``[M, mb, ...]`` output. Composes
  with data parallelism: on a 2-D ('data', 'stage') mesh the microbatch
  arrays shard their batch dim over 'data' and the whole schedule runs
  per data shard.
- Backward is ``jax.grad`` through the scan: ppermute transposes to the
  inverse permutation and the scan stashes per-tick residuals — the
  GPipe fill-drain schedule with activation checkpointing left to the
  stage_fn (compose ``nn.remat`` blocks exactly as in ViT.remat).

At THIS repo's model sizes every network fits one chip, so pp is a
capability with tests + dryrun proof, not a default: DP/FSDP (and TP
before pp) win until a single stage's weights outgrow HBM — DESIGN.md §4
states the crossover honestly.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlp_tpu.ops.kernel_gate import shard_map_compat


def create_pipeline_mesh(n_stages: int, data_parallel: int = 1,
                         devices=None) -> Mesh:
    """A 2-D ('data', 'stage') mesh. Always 2-D (data axis may be size 1)
    so the kernel gate's non-1-D quarantine applies: Mosaic kernels take
    their XLA fallbacks, which partition correctly under the pipeline's
    shard_map."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_stages * data_parallel
    if need > len(devices):
        raise ValueError(
            f"pipeline mesh needs {data_parallel}x{n_stages}="
            f"{need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data_parallel, n_stages)
    return Mesh(arr, ("data", "stage"))


def stack_stage_params(block_params: Sequence, n_stages: int):
    """``depth`` per-block param trees -> one tree with leaves
    ``[n_stages, depth//n_stages, ...]`` ready to shard ``P('stage')``.
    All blocks must share one structure (homogeneous stack — e.g. the
    ViT EncoderBlocks, models/vit.py)."""
    depth = len(block_params)
    if depth % n_stages:
        raise ValueError(f"depth={depth} not divisible by "
                         f"n_stages={n_stages}")
    per = depth // n_stages
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *block_params)
    return jax.tree.map(
        lambda l: l.reshape((n_stages, per) + l.shape[1:]), stacked)


def stage_params_sharding(stacked_params, mesh: Mesh,
                          stage_axis: str = "stage"):
    """NamedShardings placing each stage's slice on its stage row."""
    sh = NamedSharding(mesh, P(stage_axis))
    return jax.tree.map(lambda _: sh, stacked_params)


def scan_blocks_stage_fn(apply_fn: Callable) -> Callable:
    """Stage function scanning a stage's local blocks: ``apply_fn(p, h)``
    applies ONE block; the returned fn applies the ``[depth/n, ...]``
    stack a stage owns (second leading param dim) via lax.scan."""
    def stage_fn(p_stage, h):
        def step(carry, p_block):
            return apply_fn(p_block, carry), None

        out, _ = lax.scan(step, h, p_stage)
        return out

    return stage_fn


def make_pipeline_fn(stage_fn: Callable, mesh: Mesh, n_stages: int,
                     n_microbatches: int, stage_axis: str = "stage",
                     data_axis: str = "data") -> Callable:
    """Build ``fn(stacked_params, x) -> y`` running the GPipe schedule.

    ``stage_fn(p_stage, h) -> h'`` must be shape/dtype-preserving (a
    homogeneous block stack). ``stacked_params``: leaves
    ``[n_stages, ...]`` (see stack_stage_params), sharded P(stage_axis).
    ``x``: ``[M, mb, ...]`` microbatches, batch dim (1) sharded over
    ``data_axis`` when the mesh has one of size > 1.
    """
    if n_microbatches < 1:
        raise ValueError(f"n_microbatches={n_microbatches} < 1")
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if sizes.get(stage_axis) != n_stages:
        raise ValueError(
            f"mesh {stage_axis!r} axis is {sizes.get(stage_axis)}, "
            f"expected n_stages={n_stages}")
    has_dp = data_axis in sizes and sizes[data_axis] > 1
    n, M = n_stages, n_microbatches

    def body(params_local, x_local):
        # params_local leaves: [1, ...] (this stage's slice); x_local:
        # [M, mb_local, ...] (replicated over the stage axis)
        p = jax.tree.map(lambda a: a[0], params_local)
        s = lax.axis_index(stage_axis)
        pad = jnp.zeros((n - 1,) + x_local.shape[1:], x_local.dtype)
        stream = jnp.concatenate([x_local, pad], 0)  # [M+n-1, mb, ...]

        def tick(carry, x_t):
            h = jnp.where(s == 0, x_t, carry)  # stage 0 ingests the stream
            y = stage_fn(p, h)
            # one ring hop per tick; the wraparound (n-1 -> 0) is ignored
            # by stage 0's ingest select above
            nxt = lax.ppermute(y, stage_axis,
                               [(i, (i + 1) % n) for i in range(n)])
            out = jnp.where(s == n - 1, y, jnp.zeros_like(y))
            return nxt, out

        _, outs = lax.scan(tick, jnp.zeros_like(x_local[0]), stream)
        # first n-1 ticks are pipeline fill; then microbatches 0..M-1
        # finish in order on the LAST stage — masked psum replicates them
        return lax.psum(outs[n - 1:], stage_axis)

    xspec = P(None, data_axis) if has_dp else P(None)
    # P(stage_axis) is a pytree-prefix spec: every params leaf shards its
    # stage dim; x shards its batch dim over 'data' (microbatch dim whole)
    return shard_map_compat(body, mesh, in_specs=(P(stage_axis), xspec),
                            out_specs=xspec)
