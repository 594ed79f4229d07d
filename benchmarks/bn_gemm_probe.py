#!/usr/bin/env python
"""BN(+ReLU)-prologue GEMM probe: the one structural ResNet50 lever.

DESIGN.md §4e: ResNet50 training is HBM-roofline-bound and the extra
traffic is BatchNorm passes around cheap 1x1 GEMMs. At a bottleneck block
boundary the forward computes ``relu(bn(x)) @ W`` (reference
torchvision Bottleneck; our models/resnet.py:100-116): XLA materializes
the normalized tensor (write + re-read of a [B,H,W,C] bf16 map) before
the GEMM. A Pallas GEMM that applies the folded BN affine + ReLU in its
*prologue* (x read once, no intermediate) should win up to the traffic
ratio (~2.6x on paper for C=256 -> K=64 at stage-1 shapes).

Measures, at the stage-1 and stage-2 boundary shapes (batch 128):
- xla:    y = relu(x * a + b); out = y @ W     (two XLA ops, jitted)
- pallas: fused prologue GEMM (one pallas_call), value-checked vs xla

Writes benchmarks/bn_gemm_probe.json. Usage (real chip):
    python benchmarks/bn_gemm_probe.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache", "tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

K_ITERS = 20
REPEATS = 3


def timed(fn, *args) -> float:
    """ms per call: jitted K-iter scan, min of REPEATS (bench convention).
    The scan carry perturbs the first operand so iterations can't CSE."""

    @jax.jit
    def run(a0, *rest):
        def body(c, _):
            out = fn(c, *rest)
            # feed a cheap function of the output back into the carry
            return c + out[:1, :1].astype(c.dtype).sum() * 0, None

        c, _ = jax.lax.scan(body, a0, None, length=K_ITERS)
        return jnp.sum(c[:1, :1].astype(jnp.float32))

    run(*args).block_until_ready()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run(*args).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / K_ITERS)
    return best * 1e3


def _bn_gemm_kernel(x_ref, a_ref, b_ref, w_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    y = jnp.maximum(x * a_ref[...] + b_ref[...], 0.0).astype(jnp.bfloat16)
    o_ref[...] = jnp.dot(
        y, w_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def make_pallas(m: int, c: int, k: int, tm: int):
    grid = (m // tm,)
    return pl.pallas_call(
        _bn_gemm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.bfloat16),
    )


def main() -> None:
    out = {}
    # (label, B*H*W rows, C in, K out) — bottleneck boundary GEMM shapes
    shapes = [
        ("stage1_256to64", 128 * 56 * 56, 256, 64),
        ("stage2_512to128", 128 * 28 * 28, 512, 128),
        ("stage1_expand_64to256", 128 * 56 * 56, 64, 256),
    ]
    rng = np.random.default_rng(0)
    for label, m, c, k in shapes:
        x = jnp.asarray(rng.standard_normal((m, c)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal((1, c)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((1, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, k)) * 0.05, jnp.bfloat16)

        def xla_fn(x, a, b, w):
            y = jnp.maximum(x.astype(jnp.float32) * a + b,
                            0.0).astype(jnp.bfloat16)
            return jnp.dot(y, w, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        # row tile: x block + out block double-buffered under ~12M VMEM
        tm = 512
        while tm > 64 and (m % tm or
                           2 * tm * (c + k) * 2 + c * k * 2 > 12 * 2**20):
            tm //= 2
        fused = make_pallas(m, c, k, tm)

        ref = xla_fn(x, a, b, w)
        got = fused(x, a, b, w)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                    got.astype(jnp.float32))))
        t_xla = timed(xla_fn, x, a, b, w)
        t_pl = timed(fused, x, a, b, w)
        out[label] = {"m": m, "c": c, "k": k, "tile_m": tm,
                      "max_abs_err": round(err, 4),
                      "xla_ms": round(t_xla, 3),
                      "pallas_fused_ms": round(t_pl, 3),
                      "speedup": round(t_xla / t_pl, 3)}
        print(label, out[label], flush=True)

    path = os.path.join(REPO, "benchmarks", "bn_gemm_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
