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
                devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices) if data_parallel in (-1, 0) else data_parallel
    if n > len(devices):
        raise ValueError(
            f"requested data_parallel={n} but only {len(devices)} devices")
    return Mesh(np.asarray(devices[:n]).reshape(n), (axis_name,))


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
