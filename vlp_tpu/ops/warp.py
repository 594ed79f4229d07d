"""TPU-native affine warping.

The straightforward bilinear warp (per-pixel 2-D gather,
vlp_tpu.ops.augment._warp_one) lowers to an XLA gather that executes at
~0.5 ms per image on TPU — it was 90% of the measured train-step time
(264 ms of a 292 ms step at batch 128). This module implements the same
affine family with TPU-friendly primitives:

- rotation + translation via the classic 3-shear decomposition (Paeth
  1986): x-shear, y-shear, x-shear. Each shear is a per-row fractional lane
  shift executed by the Pallas kernel in vlp_tpu.ops.pallas_shear (bitwise
  masked in-VMEM rotates — no gathers).
  Shear coefficients for the inverse map src = R(-theta)(p-c)+c-t:
    a1 = a3 = -tan(theta/2), a2 = sin(theta), b2 = -ty, b1 = -tx - a1*b2
  (solved so the composed three-pass map equals the 2-D affine exactly;
  verified numerically in tests/test_warp.py).
- zoom via per-sample separable bilinear resampling: two batched matmuls
  (``Wy @ img @ Wx^T``) whose [S,S] weight matrices are built elementwise —
  pure MXU work.
- optional x-shear augmentation pass (pretrain ±5°) as one more shear.

Interpolation note: three sequential 1-D bilinear passes are not bit-equal
to one 2-D bilinear pass, but agree closely on natural images; parity with
the gather reference is pinned by tests (tests/test_warp.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp



def _zoom_matrix(size: int, zoom: jax.Array) -> jax.Array:
    """[S, S] bilinear resampling weights for src = (x - c)/zoom + c with
    edge clamping. Two nonzero entries per row -> dense matmul on MXU."""
    c = (size - 1) / 2.0
    dst = jnp.arange(size, dtype=jnp.float32)
    src = (dst - c) / zoom + c  # [S]
    src = jnp.clip(src, 0.0, size - 1.0)
    k = jnp.floor(src)
    f = src - k
    cols = jnp.arange(size, dtype=jnp.float32)[None, :]
    lo = (cols == k[:, None]).astype(jnp.float32) * (1.0 - f[:, None])
    hi = (cols == jnp.minimum(k + 1, size - 1)[:, None]).astype(
        jnp.float32) * f[:, None]
    return lo + hi


def _use_pallas_interpret() -> bool:
    """Real Mosaic kernels on TPU; interpreter elsewhere (CPU tests)."""
    return jax.devices()[0].platform not in ("tpu", "axon")


def affine_warp_shear(images: jax.Array, theta: jax.Array, zoom: jax.Array,
                      tx: jax.Array, ty: jax.Array,
                      shear: Optional[jax.Array] = None,
                      max_shift: Optional[int] = None) -> jax.Array:
    """Batched TPU-native warp. images [B, H, W] float; per-sample params.

    Semantics match vlp_tpu.ops.augment's composed inverse map
    (translate -> rotate -> zoom about the center, border padding) up to
    1-D-vs-2-D interpolation differences.

    Implementation: three batch-level shear passes through the Pallas kernel
    (vlp_tpu.ops.pallas_shear; per-(sample,row) VMEM dynamic slices — the
    XLA batched-gather equivalent measured 20x slower), then the zoom as a
    per-sample bilinear-matrix einsum on the MXU.
    """
    from vlp_tpu.ops.pallas_shear import shear_axis1_batched

    b, h, w = images.shape
    if shear is None:
        shear = jnp.zeros((b,), jnp.float32)
    if max_shift is None:
        # tan(15deg)*112 + 20px translate + shear slack, rounded up
        max_shift = int(0.27 * max(h, w) + 24 + 0.1 * max(h, w))
    interp = _use_pallas_interpret()

    images = images.astype(jnp.float32)
    half = jnp.tan(theta / 2.0)
    a1, a2, a3 = -half, jnp.sin(theta), -half
    b2 = -ty
    b1 = -tx - a1 * b2
    v = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0  # row coords
    u = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0  # col coords

    # P1: x-shear (content shear for pretrain fused into the slope)
    slope1 = a1 - jnp.tan(shear)
    shift1 = slope1[:, None] * v[None, :] + b1[:, None]  # [B, H]
    x1 = shear_axis1_batched(images, shift1, max_shift, interpret=interp)
    # P2: y-shear via transpose
    shift2 = a2[:, None] * u[None, :] + b2[:, None]  # [B, W]
    x2 = shear_axis1_batched(
        x1.transpose(0, 2, 1), shift2, max_shift,
        interpret=interp).transpose(0, 2, 1)
    # P3: x-shear
    shift3 = a3[:, None] * v[None, :]
    x3 = shear_axis1_batched(x2, shift3, max_shift, interpret=interp)
    # zoom about center: out = Wz @ img @ Wz^T per sample (square images)
    wz = jax.vmap(lambda z: _zoom_matrix(h, z))(zoom)  # [B, S, S]
    return jnp.einsum("bij,bjk,blk->bil", wz, x3, wz,
                      preferred_element_type=jnp.float32)
