"""Pallas TPU kernel: per-row fractional lane shift (the shear primitive).

Why: the shear decomposition's inner op is ``out[b,y,x] = img[b,y,x+s(b,y)]``
with per-(sample,row) fractional shifts. In XLA this is a batched gather —
measured ~40 ms per pass for [128,224,224] on v5e (vs 2 ms when the shift is
shared across the batch). Per-pixel gathers are unnecessary: a shift is a
rotation of each row, and a per-row VARIABLE rotation decomposes into
log2(max_shift) FIXED rotations selected per row by the shift's bits.

Kernel: one [H, Wp] image tile in VMEM; per-row int32 shifts and fp32
fractions ride as [H, 1] VMEM columns (broadcast against the tile). For each
bit k the whole tile is rotated left by 2^k lanes and merged with a per-row
mask — pure VPU work, no loops, no gathers, ~10 vector passes per shear.
Bilinear lerp between shift k and k+1 closes the op. Measured: the full
3-shear warp drops from 264 ms (XLA gather) to ~1 ms/batch inside the train
step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shear_kernel(starts_ref, frac_ref, img_ref, out_ref, *, num_bits: int):
    w = out_ref.shape[2]
    wp = img_ref.shape[2]
    tile = img_ref[0]  # [H, WPA] f32
    st = starts_ref[0]  # [H, 1] int32
    for k in range(num_bits):
        shift = 1 << k
        bit = ((st >> k) & 1) > 0  # [H, 1] bool, broadcasts over lanes
        # left-rotate by `shift` == non-negative roll by wp - shift
        rolled = pltpu.roll(tile, wp - shift, 1)
        tile = jnp.where(bit, rolled, tile)
    f = frac_ref[0]  # [H, 1] f32
    out_ref[0] = tile[:, :w] * (1.0 - f) + tile[:, 1 : w + 1] * f


@functools.partial(jax.jit, static_argnames=("out_width", "num_bits",
                                             "interpret"))
def shear_rows(padded: jax.Array, starts: jax.Array, frac: jax.Array,
               out_width: int, num_bits: int,
               interpret: bool = False) -> jax.Array:
    """padded [B, H, Wp] f32 (Wp multiple of 128, Wp >= 2^num_bits-1 +
    out_width + 1), starts [B, H] int32 in [0, 2^num_bits), frac [B, H] f32
    in [0,1) -> [B, H, out_width]:
        out[b,y,x] = lerp(padded[b,y,s+x], padded[b,y,s+1+x], frac)
    """
    b, h, wp = padded.shape
    starts3 = starts.astype(jnp.int32)[:, :, None]  # [B, H, 1]
    frac3 = frac.astype(padded.dtype)[:, :, None]
    kernel = functools.partial(_shear_kernel, num_bits=num_bits)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, out_width), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, out_width), padded.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(num_bits + 3) * b * h * wp,
            bytes_accessed=(num_bits + 2) * padded.size * 4,
            transcendentals=0),
    )(starts3, frac3, padded)


def shear_axis1_batched(images: jax.Array, shift: jax.Array, max_shift: int,
                        interpret: bool = False) -> jax.Array:
    """Batched per-row fractional shift with edge padding:
    out[b,y,x] = images[b,y,x + shift[b,y]] (clamped, bilinear).
    images [B, H, W] f32, shift [B, H] f32."""
    b, h, w = images.shape
    pad = max_shift + 1
    max_start = 2 * max_shift + 1
    num_bits = max(1, int(max_start).bit_length())
    # lane padding: start range + output width + lerp neighbour, rounded to
    # a 128 multiple for clean VMEM tiling
    need = (1 << num_bits) - 1 + w + 1
    wp = ((max(w + 2 * pad, need) + 127) // 128) * 128
    padded = jnp.pad(images, ((0, 0), (0, 0), (pad, wp - w - pad)),
                     mode="edge")
    s = jnp.clip(shift, -max_shift, max_shift) + pad
    k = jnp.floor(s)
    frac = s - k
    return shear_rows(padded, k.astype(jnp.int32), frac, w,
                      num_bits=num_bits, interpret=interpret)
