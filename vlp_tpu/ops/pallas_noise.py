"""Pallas TPU kernel: per-sample Gaussian noise from the hardware PRNG.

Why: the augmentation's noise draw (`jax.random.normal` over [B, 224, 224])
costs ~4.1 ms/batch — ~85% of the whole augmentation block and ~12% of the
VLP train step. Threefry is a deliberately compute-heavy counter-based hash;
the TPU's native PRNG (pltpu.prng_random_bits) is nearly free, and
Box-Muller turns two uniform draws into exact Gaussians with a handful of
VPU passes.

Semantics: adds sigma[b] * N(0, 1) per sample — same distribution as the
reference's MONAI RandGaussianNoised, but a DIFFERENT (still deterministic,
seed-derived) random stream than jax.random.normal. CPU keeps the jax
threefry path (vlp_tpu.ops.augment dispatches), so cross-backend runs are
not bit-identical in the noise — documented in DESIGN.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _kernel(seed_ref, sigma_ref, x_ref, o_ref):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i])
    h, w = x_ref.shape[1:]
    # PRNG word generation is the hard cost (~0.5 ns/word on v5e — measured
    # ~3 ms for 6.4M words, shape/grid independent), so draw HALF a word
    # per output: one uint32 -> two 16-bit uniforms -> one Box-Muller pair
    # (both cos AND sin outputs used). 16-bit granularity truncates the
    # tails at ~4.8 sigma — far beyond what sigma<=0.01 noise needs.
    bits = pltpu.prng_random_bits((h, w // 2))
    m16 = jnp.int32(0xFFFF)
    # low/high 16 bits -> uniforms; +2^-17 keeps log() finite
    u1 = (bits & m16).astype(jnp.float32) * (2.0 ** -16) + (2.0 ** -17)
    u2 = ((bits >> 16) & m16).astype(jnp.float32) * (2.0 ** -16)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    t = _TWO_PI * u2
    s = sigma_ref[i]
    x = x_ref[...]
    # iid placement: left half gets the cos branch, right half the sin
    o_ref[0, :, :w // 2] = x[0, :, :w // 2] + s * (r * jnp.cos(t))
    o_ref[0, :, w // 2:] = x[0, :, w // 2:] + s * (r * jnp.sin(t))


def add_gaussian_noise(x: jax.Array, seeds: jax.Array, sigma: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """x [B, H, W] f32 + sigma[b] * N(0,1) with per-sample hardware-PRNG
    streams (seeds [B] int32; sigma [B] f32, 0 disables per sample).
    Requires even W (Box-Muller pair layout); callers fall back otherwise."""
    b, h, w = x.shape
    assert w % 2 == 0, "add_gaussian_noise requires even width"
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            # whole [B] scalar vectors in SMEM, indexed by program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * w,
            bytes_accessed=2 * b * h * w * 4,
            transcendentals=3 * b * h * w),
    )(seeds.reshape(b).astype(jnp.int32),
      sigma.reshape(b).astype(jnp.float32), x)
