"""Single gate for Mosaic (Pallas TPU) kernel dispatch.

Mosaic custom calls cannot be auto-partitioned by GSPMD: lowering a
pallas_call inside a mesh-sharded jit with num_devices > 1 raises
NotImplementedError ("wrap the call in a shard_map", jax
tpu_custom_call.py). The kernels here are embarrassingly batch-parallel,
so multi-device dispatch wraps each kernel in a ``shard_map`` over the
registered mesh (leading dim sharded on the data axis, weights replicated)
— the kernel body then runs per shard exactly as in the single-chip case.

The ACTIVE KERNEL MESH is registered by whoever builds the mesh/steps
(``parallel.mesh.create_mesh``, ``train.step`` factories); kernels consult
it at trace time. With no registered mesh in a multi-device process the
kernels fall back to the XLA paths (correct everywhere, slower).

CPU is unaffected: the XLA fallbacks are the default there, and the Pallas
interpreter (used by kernel tests) honors the same shard_map wrapping.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)
_warned = False

# (Mesh, axis_name) registered by mesh/step factories; None = no mesh.
_KERNEL_MESH: Optional[Tuple] = None


def set_kernel_mesh(mesh, axis_name: str = "data") -> None:
    """Register the process-wide mesh kernels shard_map over. Idempotent;
    called from ``create_mesh`` and the step factories.

    Only 1-D data meshes are ever registered: the kernel shard_map specs
    (P(axis) over dim 0, weights P()) assume every device is a data shard.
    On a 2-D (data x model) mesh those specs would force-gather the
    TP-sharded weights and mis-size supports() checks, so a non-1-D mesh
    registers None here and kernels take their XLA fallbacks (which GSPMD
    partitions correctly over both axes). Centralized in the setter so
    step factories can't re-engage kernels create_mesh quarantined."""
    global _KERNEL_MESH
    if mesh is not None and len(mesh.axis_names) != 1:
        mesh = None
    _KERNEL_MESH = None if mesh is None else (mesh, axis_name)


def active_kernel_mesh() -> Tuple[Optional[object], Optional[str]]:
    """(mesh, axis_name) when a multi-device mesh is registered, else
    (None, None). Single-device meshes need no wrapping."""
    if _KERNEL_MESH is None:
        return None, None
    mesh, axis = _KERNEL_MESH
    if mesh.size <= 1:
        return None, None
    return mesh, axis


def kernel_dispatch_key() -> Tuple:
    """Hashable token capturing every process-global input to kernel
    dispatch: backend, the ``VLP_DISABLE_PALLAS`` / ``VLP_PALLAS_INTERPRET``
    env switches, and the active kernel mesh.

    Module-level jit-cached functions that consult the gate at trace time
    (``ops.augment.augment_and_normalize``) must take this as a static
    argument: jit keys only on shapes/statics, so without it a trace made
    before ``set_kernel_mesh`` (warmup, test ordering) would be silently
    reused afterward with the wrong dispatch baked in — or a shard_map
    trace bound to a stale mesh would outlive the mesh it captured."""
    import os

    mesh, axis = active_kernel_mesh()
    return (jax.default_backend(),
            os.environ.get("VLP_DISABLE_PALLAS", "0"),
            os.environ.get("VLP_PALLAS_INTERPRET", "0"),
            os.environ.get("VLP_MEGA_TRANSPOSED", "0"),
            os.environ.get("VLP_MEGA_SERIAL", "0"),
            os.environ.get("VLP_BLOCKATTN_GROUPED", "0"),
            None if mesh is None else (mesh, axis))


def mosaic_ok() -> bool:
    """True when real Mosaic kernels can run: TPU backend, and either a
    single device or a registered mesh to shard_map over.

    ``VLP_DISABLE_PALLAS=1`` forces False — used by the benchmark FLOPs
    accounting to lower a pure-XLA variant of the model (custom calls are
    opaque to XLA's HLO cost analysis), and as an operational escape hatch.
    """
    import os

    global _warned
    if os.environ.get("VLP_DISABLE_PALLAS", "0") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if jax.device_count() == 1:
        return True
    if _KERNEL_MESH is not None and _KERNEL_MESH[0].size == jax.device_count():
        return True
    if not _warned:
        logger.warning(
            "Pallas TPU kernels disabled: %d-device process without a "
            "registered kernel mesh covering all devices (Mosaic custom "
            "calls cannot be GSPMD-partitioned; call "
            "parallel.mesh.create_mesh or set_kernel_mesh) — using XLA "
            "fallbacks", jax.device_count())
        _warned = True
    return False


def use_interpret() -> bool:
    """Pallas interpret-mode opt-in (CPU kernel tests); VLP_DISABLE_PALLAS
    wins. Single source of truth for every kernel module."""
    import os

    return os.environ.get("VLP_DISABLE_PALLAS", "0") != "1" and \
        os.environ.get("VLP_PALLAS_INTERPRET", "0") == "1"


def shard_map_compat(body, mesh, in_specs, out_specs):
    """shard_map with the check_vma (jax>=0.8) / check_rep fallback —
    shared by shard_wrap and the resident-corpus gather."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return shard_map(body, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax
        return shard_map(body, check_rep=False, **kwargs)


def shard_wrap(fn, n: int, in_batched, out_batched):
    """shard_map-wrap a batch-parallel kernel call over the active mesh.

    ``in_batched`` / ``out_batched``: per-argument / per-output bools —
    True = sharded on dim 0 over the data axis, False = replicated.
    ``n`` is the global leading (batch) dim; returns the wrapped fn, or
    None when a multi-device mesh is active but ``n`` does not divide over
    it (caller must take the XLA fallback). With no active mesh the fn is
    returned unchanged.
    """
    mesh, axis = active_kernel_mesh()
    if mesh is None:
        return fn
    if n % mesh.size:
        return None
    from jax.sharding import PartitionSpec as P

    spec = lambda b: P(axis) if b else P()
    return shard_map_compat(fn, mesh,
                            tuple(spec(b) for b in in_batched),
                            jax.tree.map(spec, out_batched))
