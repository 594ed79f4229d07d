#!/usr/bin/env python
"""Microbenchmark for the half-block megakernels (ops/fused_block.py) at
NesT-Small level shapes, on the current device.

Times each kernel (fwd alone, and fwd+bwd via jax.grad) with the same
forced-value scan protocol as bench.py, per level, so kernel-scheduling
experiments (DESIGN.md §7b "software-pipelined compute" future work) can
iterate in seconds instead of re-running the full nest_small train bench.

Usage: python benchmarks/mega_micro.py [attn|mlp|all] [--levels 3]
"""
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
import numpy as np

from vlp_tpu.ops import fused_block as FB

# NesT-Small per-level shapes at batch 128 (models/nest.py): block 14,
# S=196; level l has n_windows = 16/4/1 per sample, dim 96/192/384,
# heads 3/6/12, depth 2/2/20. The megakernel sees [N, S, D] with
# N = batch * n_windows and ln_mlp sees [N*S, D].
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
LEVELS = {
    1: dict(nw=16, d=96, heads=3, depth=2),
    2: dict(nw=4, d=192, heads=6, depth=2),
    3: dict(nw=1, d=384, heads=12, depth=20),
}
S = 196
K = int(os.environ.get("BENCH_STEPS", "100"))
REPEATS = 3


def _time_scan(fn, *args) -> float:
    """ms per call: K calls inside one jitted scan, min of REPEATS."""

    def body(c, _):
        out = fn(*[c[i] if i == 0 else a for i, a in enumerate(args)])
        # thread the x-like output back through the carry to serialize
        return (out[0] if isinstance(out, tuple) else out,), None

    @jax.jit
    def run(x0):
        (xK,), _ = jax.lax.scan(body, (x0,), None, length=K)
        return jnp.sum(xK.astype(jnp.float32))

    run(args[0]).block_until_ready()  # compile
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run(args[0]).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def attn_args(level: int, dtype=jnp.bfloat16):
    cfg = LEVELS[level]
    n, d = BATCH * cfg["nw"], cfg["d"]
    ks = jax.random.split(jax.random.PRNGKey(level), 7)
    x = jax.random.normal(ks[0], (n, S, d), dtype)
    gamma = jnp.ones((d,), jnp.float32)
    beta = jnp.zeros((d,), jnp.float32)
    wqkv = (jax.random.normal(ks[1], (d, 3 * d), dtype) * d ** -0.5)
    bqkv = jnp.zeros((3 * d,), jnp.float32)
    wout = (jax.random.normal(ks[2], (d, d), dtype) * d ** -0.5)
    bout = jnp.zeros((d,), jnp.float32)
    return (x, gamma, beta, wqkv, bqkv, wout, bout), cfg["heads"]


def mlp_args(level: int, dtype=jnp.bfloat16):
    cfg = LEVELS[level]
    m, d = BATCH * cfg["nw"] * S, cfg["d"]
    f = 4 * d
    ks = jax.random.split(jax.random.PRNGKey(100 + level), 3)
    x = jax.random.normal(ks[0], (m, d), dtype)
    gamma = jnp.ones((d,), jnp.float32)
    beta = jnp.zeros((d,), jnp.float32)
    w1 = jax.random.normal(ks[1], (d, f), dtype) * d ** -0.5
    b1 = jnp.zeros((f,), jnp.float32)
    w2 = jax.random.normal(ks[2], (f, d), dtype) * f ** -0.5
    b2 = jnp.zeros((d,), jnp.float32)
    return (x, gamma, beta, w1, b1, w2, b2)


def grad_wrap(fn):
    """Sum-output value+grad wrt x — exercises BOTH kernels (grad alone
    would let XLA DCE the forward pallas_call: the custom-VJP residuals
    are the inputs, not y). Folds the primal into dx so neither kernel's
    output is dead; returns (dx,) so _time_scan can thread the carry."""

    def g(*args):
        val, dx = jax.value_and_grad(lambda x: jnp.sum(
            fn(x, *args[1:]).astype(jnp.float32)))(args[0])
        return (dx + (val * 0.0).astype(dx.dtype),)

    return g


def bwd_wrap(fn):
    """Backward kernel ONLY: grad without using the primal — XLA DCEs the
    forward pallas_call (residuals are the inputs)."""

    def g(*args):
        return (jax.grad(lambda x: jnp.sum(
            fn(x, *args[1:]).astype(jnp.float32)))(args[0]),)

    return g


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    levels = [int(x) for x in os.environ.get("LEVELS", "1,2,3").split(",")]
    dev = jax.devices()[0]
    print(f"device={dev.device_kind} batch={BATCH} K={K}")
    total_fwd = total_train = 0.0
    for lv in levels:
        depth = LEVELS[lv]["depth"]
        if which in ("attn", "all"):
            args, heads = attn_args(lv)
            fwd = functools.partial(FB.ln_attention, num_heads=heads)
            t_f = _time_scan(fwd, *args)
            t_b = _time_scan(bwd_wrap(fwd), *args)
            print(f"L{lv} attn  fwd {t_f:7.3f} ms  bwd {t_b:7.3f} ms"
                  f"  (x{depth} blocks: {depth * t_f:7.2f} /"
                  f" {depth * t_b:7.2f} ms)")
            total_fwd += depth * t_f
            total_train += depth * (t_f + t_b)
        if which in ("mlp", "all"):
            args = mlp_args(lv)
            t_f = _time_scan(FB.ln_mlp, *args)
            t_b = _time_scan(bwd_wrap(FB.ln_mlp), *args)
            print(f"L{lv} mlp   fwd {t_f:7.3f} ms  bwd {t_b:7.3f} ms"
                  f"  (x{depth} blocks: {depth * t_f:7.2f} /"
                  f" {depth * t_b:7.2f} ms)")
            total_fwd += depth * t_f
            total_train += depth * (t_f + t_b)
    print(f"TOTAL kernel time/step: fwd {total_fwd:.2f} ms,"
          f" train(fwd+bwd) {total_train:.2f} ms"
          f"  -> {BATCH / (total_train / 1e3):.0f} img/s kernel-bound")


if __name__ == "__main__":
    main()
