"""Single gate for Mosaic (Pallas TPU) kernel dispatch.

Mosaic custom calls cannot be auto-partitioned by GSPMD: lowering a
pallas_call inside a mesh-sharded jit with num_devices > 1 raises
NotImplementedError ("wrap the call in a shard_map", jax
tpu_custom_call.py). Until the kernels are shard_map-wrapped, multi-chip
TPU processes fall back to the XLA paths (correct everywhere, slower);
single-chip TPU — the benchmarked configuration — uses the real kernels.

CPU is unaffected: the XLA fallbacks are the default there, and the Pallas
interpreter (used by kernel tests) partitions fine.
"""
from __future__ import annotations

import jax

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)
_warned = False


def mosaic_ok() -> bool:
    """True when real Mosaic kernels can run: TPU backend, single device."""
    global _warned
    if jax.default_backend() != "tpu":
        return False
    if jax.device_count() == 1:
        return True
    if not _warned:
        logger.warning(
            "Pallas TPU kernels disabled under a %d-device process (Mosaic "
            "custom calls cannot be GSPMD-partitioned; shard_map wrapping "
            "pending) — using XLA fallbacks", jax.device_count())
        _warned = True
    return False
