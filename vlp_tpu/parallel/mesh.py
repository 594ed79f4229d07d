"""Device mesh + sharding helpers.

The reference has no distributed code at all (SURVEY.md §2: every run is one
GPU). Data parallelism over ICI is therefore a NEW first-class component
here: a 1-D ``jax.sharding.Mesh`` over all chips with batches sharded on the
'data' axis and parameters replicated. Collectives are inserted by GSPMD:
gradient psum from the sharded-batch loss, all-gather for the [B,B]
contrastive logits, psum for streaming metric reductions.

The mesh abstraction keeps a second ('model') axis available so tensor
sharding / multi-slice DCN can be added without API changes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data_parallel: int = -1, axis_name: str = "data",
                devices: Optional[Sequence] = None,
                model_parallel: int = 1,
                model_axis_name: str = "model") -> Mesh:
    """1-D data mesh, or a 2-D (data, model) mesh when
    ``model_parallel > 1``: batches shard over the data axis, tensor-
    parallel weights (``shard_train_state(..., "tp")``) over the model
    axis — GSPMD partitions the matmuls/convs and inserts the forward
    all-reduces (Megatron-style TP by annotation). ``data_parallel=-1``
    uses all remaining devices after the model axis."""
    devices = list(devices if devices is not None else jax.devices())
    mp = max(1, int(model_parallel))
    if len(devices) % mp:
        raise ValueError(
            f"model_parallel={mp} does not divide {len(devices)} devices")
    if data_parallel in (-1, 0):  # 0 kept as 'all' for config back-compat
        n = len(devices) // mp
    elif data_parallel < 0:
        raise ValueError(f"invalid data_parallel={data_parallel}")
    else:
        n = data_parallel
    if n * mp > len(devices):
        raise ValueError(
            f"requested data_parallel={n} x model_parallel={mp} but only "
            f"{len(devices)} devices")
    from vlp_tpu.ops.kernel_gate import set_kernel_mesh

    if mp > 1:
        mesh = Mesh(np.asarray(devices[:n * mp]).reshape(n, mp),
                    (axis_name, model_axis_name))
        # Mosaic kernels shard_map over a 1-D data mesh only; under a 2-D
        # mesh they fall back to the (correct, auto-partitioned) XLA paths
        set_kernel_mesh(None)
        return mesh
    mesh = Mesh(np.asarray(devices[:n]).reshape(n), (axis_name,))
    # register as the process-wide kernel mesh: Pallas kernels shard_map
    # over it instead of falling back to XLA in multi-device processes
    set_kernel_mesh(mesh, axis_name)
    return mesh


def axis_size(mesh: Mesh, axis_name: str = "data") -> int:
    """Size of one named mesh axis. Batches/corpus rows shard over the
    DATA axis only, so divisibility and per-device-memory math must use
    this — ``mesh.size`` over-counts by the model_parallel factor on a
    2-D mesh."""
    return dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch dict onto the mesh, sharded along axis 0. Batch
    sizes must be divisible by the mesh size (the input pipeline pads)."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# -- FSDP (ZeRO-style) parameter/optimizer-state sharding -----------------
#
# The second scaling axis that actually fits this workload: compute scales
# by data parallelism; MEMORY scales by sharding params + Adam moments over
# the same axis. GSPMD inserts the all-gathers at use sites and
# reduce-scatters for the sharded updates (the scaling-book recipe) — no
# manual collectives.

_FSDP_MIN_SIZE = 2 ** 16  # leaves smaller than this stay replicated


def _fsdp_spec(shape, mesh_size: int, axis_name: str):
    if not shape or int(np.prod(shape)) < _FSDP_MIN_SIZE:
        return P()
    # shard the largest dim divisible by the mesh (ties -> last such dim:
    # for conv kernels that's the channel dims, never the tiny k_h/k_w)
    best, best_size = None, 0
    for i, s in enumerate(shape):
        if s % mesh_size == 0 and s >= best_size:
            best, best_size = i, s
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis_name
    return P(*spec)


def _axis_state_sharding(state, mesh: Mesh, axis_name: str):
    """TrainState-shaped pytree of NamedShardings: large params + optimizer
    moments sharded per _fsdp_spec over ONE named axis (divisor = that
    axis's size, not mesh.size), small leaves replicated. Shared leaf rule
    for fsdp (data axis) and tp (model axis)."""
    n = axis_size(mesh, axis_name)

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, _fsdp_spec(shape, n, axis_name))

    return jax.tree.map(rule, state)


def fsdp_state_sharding(state, mesh: Mesh, axis_name: str = "data"):
    """Params and Adam moments ZeRO-sharded over the data axis."""
    return _axis_state_sharding(state, mesh, axis_name)


# -- Tensor parallelism (2-D dp x tp mesh) ---------------------------------
#
# Weights shard over the MODEL axis of a create_mesh(model_parallel=N)
# mesh; GSPMD partitions every dot/conv that consumes a sharded weight and
# inserts the forward all-reduces over the model axis (the scaling-book
# "annotate and let XLA insert collectives" recipe). Unlike FSDP (which
# all-gathers weights at use sites so COMPUTE stays replicated), TP runs
# each matmul partitioned: compute AND weight memory scale over the model
# axis. The per-leaf rule is the same largest-divisible-dim heuristic as
# FSDP — correctness never depends on the chosen dim, only efficiency.


def tp_state_sharding(state, mesh: Mesh, model_axis_name: str = "model"):
    """Params and Adam moments sharded over the model axis."""
    return _axis_state_sharding(state, mesh, model_axis_name)


def shard_train_state(state, mesh: Mesh, mode: str = "replicated",
                      axis_name: str = "data",
                      model_axis_name: str = "model"):
    """Place a TrainState on the mesh. Returns (state, sharding_pytree)."""
    if mode == "fsdp":
        shardings = fsdp_state_sharding(state, mesh, axis_name)
        return jax.tree.map(jax.device_put, state, shardings), shardings
    if mode == "tp":
        if model_axis_name not in mesh.axis_names:
            raise ValueError(
                f"param_sharding='tp' needs a mesh with a "
                f"{model_axis_name!r} axis — create_mesh(model_parallel=N); "
                f"got axes {mesh.axis_names}")
        shardings = tp_state_sharding(state, mesh, model_axis_name)
        return jax.tree.map(jax.device_put, state, shardings), shardings
    repl = replicated(mesh)
    shardings = jax.tree.map(lambda _: repl, state)
    return jax.device_put(state, repl), shardings
