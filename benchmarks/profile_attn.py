#!/usr/bin/env python
"""Fused vs unfused attention train-step throughput (NesT-Small, ViT-B)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache", "tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    B = int(os.environ.get("BENCH_BATCH", "128"))
    K = int(os.environ.get("BENCH_STEPS", "10"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.bfloat16)

    xs = jnp.broadcast_to(x, (K,) + x.shape) + jnp.arange(
        K, dtype=jnp.bfloat16)[:, None, None, None, None] * 1e-3

    def bench(model):
        params = model.init(jax.random.key(0), x[:2])

        def loss_fn(p, x):
            return jnp.mean(model.apply(p, x).astype(jnp.float32))

        @jax.jit
        def step(p, xs):
            # real per-step param update + per-step batches: nothing is
            # loop-invariant, so XLA cannot hoist the model out of the scan
            # (the earlier constant-carry harness understated train cost)
            def body(p, x):
                l, g = jax.value_and_grad(loss_fn)(p, x)
                p = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype),
                                 p, g)
                return p, l
            p, ls = jax.lax.scan(body, p, xs)
            return ls[-1]

        float(jax.device_get(step(params, xs)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.device_get(step(params, xs)))
            ts.append(time.perf_counter() - t0)
        return min(ts) / K * 1e3

    from vlp_tpu.models.nest import NesT
    from vlp_tpu.models.vit import ViT

    which = os.environ.get("PROF_WHICH", "nest,vit")
    for fused in (True, False):
        if "nest" in which:
            m = NesT(depths=(2, 2, 20), fused_attention=fused) \
                if hasattr(NesT, "fused_attention") else NesT(depths=(2, 2, 20))
            ms = bench(m)
            print(f"nest_small fused={fused}: {ms:7.2f} ms/step "
                  f"({B/ms*1e3:6.0f} img/s)", flush=True)
        if "vit" in which:
            m = ViT(fused_attention=fused) if hasattr(ViT, "fused_attention") \
                else ViT()
            ms = bench(m)
            print(f"vit_base   fused={fused}: {ms:7.2f} ms/step "
                  f"({B/ms*1e3:6.0f} img/s)", flush=True)
        if not hasattr(NesT, "fused_attention"):
            break


if __name__ == "__main__":
    main()
