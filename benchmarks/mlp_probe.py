#!/usr/bin/env python
"""Probe WHY mlp megakernel matmuls sit at ~50% MXU: pure-matmul-chain
Pallas kernels at several tile sizes vs the plain-XLA fused equivalent."""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache", "tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlp_tpu.ops.fused_mlp import _gelu
from vlp_tpu.ops.fused_block import _ln_fwd

B, S, D = 128, 196, 384
F = 4 * D
M = B * S
K = int(os.environ.get("BENCH_STEPS", "100"))
MACS = 2 * M * D * F


def timed(fn, x0) -> float:
    @jax.jit
    def run(x):
        (xK,), _ = jax.lax.scan(lambda c, _: ((fn(c[0]),), None), (x,),
                                None, length=K)
        return jnp.sum(xK.astype(jnp.float32))

    run(x0).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(x0).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def _const(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _row2(tm, d):
    return pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)


def chain_kernel(x_ref, w1_ref, w2_ref, y_ref, *, stages):
    """y = x @ w1 @ w2 with optional epilogue stages."""
    x = x_ref[...]
    if "ln" in stages:
        xh, _ = _ln_fwd(x.astype(jnp.float32))
        x = xh.astype(x_ref.dtype)
    z = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    if "gelu" in stages:
        z = _gelu(z)
    h = z.astype(x_ref.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def make_chain(tm, stages=()):
    k = functools.partial(chain_kernel, stages=stages)

    def call(x, w1, w2):
        return pl.pallas_call(
            k, grid=(M // tm,),
            in_specs=[_row2(tm, D), _const((D, F)), _const((F, D))],
            out_specs=_row2(tm, D),
            out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        )(x, w1, w2)

    return call


def single_mm_kernel(x_ref, w1_ref, z_ref):
    z_ref[...] = jnp.dot(x_ref[...], w1_ref[...],
                         preferred_element_type=jnp.float32).astype(
        z_ref.dtype)


def make_single(tm):
    def call(x, w1):
        return pl.pallas_call(
            single_mm_kernel, grid=(M // tm,),
            in_specs=[_row2(tm, D), _const((D, F))],
            out_specs=_row2(tm, F),
            out_shape=jax.ShapeDtypeStruct((M, F), x.dtype),
        )(x, w1)

    return call


def main() -> None:
    print(f"M={M} D={D} F={F}  chain MACs {MACS/1e9:.1f} GMAC "
          f"(+single {MACS/2e9:.1f})")
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (M, D), dt)
    w1 = jax.random.normal(ks[1], (D, F), dt) * D ** -0.5
    w2 = jax.random.normal(ks[2], (F, D), dt) * F ** -0.5

    for tm in (128, 256, 512, 1024):
        t = timed(lambda xx: make_chain(tm)(xx, w1, w2), x)
        print(f"pallas chain  tm={tm:4d}        {t:7.3f} ms  "
              f"{MACS/t/1e9:6.1f} TMAC/s", flush=True)
    for tm in (256, 512):
        t = timed(lambda xx: make_chain(tm, ("gelu",))(xx, w1, w2), x)
        print(f"pallas chain+gelu tm={tm:4d}    {t:7.3f} ms  "
              f"{MACS/t/1e9:6.1f} TMAC/s", flush=True)
        t = timed(lambda xx: make_chain(tm, ("ln", "gelu"))(xx, w1, w2), x)
        print(f"pallas chain+ln+gelu tm={tm:4d} {t:7.3f} ms  "
              f"{MACS/t/1e9:6.1f} TMAC/s", flush=True)

    # single matmul [M,D]@[D,F], z stays bf16 in HBM
    for tm in (256, 512):
        t = timed(lambda xx: (make_single(tm)(xx, w1)[:, :D]
                              .astype(dt)), x)
        print(f"pallas single tm={tm:4d}        {t:7.3f} ms  "
              f"{MACS/2/t/1e9:6.1f} TMAC/s", flush=True)

    # plain XLA equivalents
    def xla_chain(xx):
        z = jnp.dot(xx, w1, preferred_element_type=jnp.float32)
        return jnp.dot(z.astype(dt), w2,
                       preferred_element_type=jnp.float32).astype(dt)

    def xla_mlp(xx):
        xh, _ = _ln_fwd(xx.astype(jnp.float32))
        z = jnp.dot(xh.astype(dt), w1, preferred_element_type=jnp.float32)
        return (xx.astype(jnp.float32) + jnp.dot(
            _gelu(z).astype(dt), w2,
            preferred_element_type=jnp.float32)).astype(dt)

    t = timed(xla_chain, x)
    print(f"XLA chain                     {t:7.3f} ms  "
          f"{MACS/t/1e9:6.1f} TMAC/s", flush=True)
    t = timed(xla_mlp, x)
    print(f"XLA ln+chain+gelu+res         {t:7.3f} ms  "
          f"{MACS/t/1e9:6.1f} TMAC/s", flush=True)


if __name__ == "__main__":
    main()
