#!/usr/bin/env python
"""NesT-Small throughput diagnosis: time fwd+bwd for per-level ablations.

Measures the full train-like step (loss = mean(features); grad wrt params)
for depth configurations that isolate each level, so the per-level cost of
nest_small (depths 2/2/20) is directly visible. K steps inside one scan,
value-fetch forced (same methodology as bench.py).
"""
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

    from vlp_tpu.models.nest import NesT

    B = int(os.environ.get("BENCH_BATCH", "128"))
    K = int(os.environ.get("BENCH_STEPS", "10"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.bfloat16)

    def measure(name, depths):
        model = NesT(depths=depths)
        params = model.init(jax.random.key(0), x[:2])

        def loss_fn(p, x):
            return jnp.mean(model.apply(p, x).astype(jnp.float32))

        @jax.jit
        def step(p, x):
            def body(c, _):
                l, g = jax.value_and_grad(loss_fn)(p, x)
                return c + l + jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b).astype(jnp.float32), g, 0.0), ()
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return out

        float(jax.device_get(step(params, x)))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.device_get(step(params, x)))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / K * 1e3
        print(f"{name:22s} depths={depths}: {ms:8.2f} ms/step "
              f"({B / (min(ts) / K):7.0f} img/s)", flush=True)
        return ms

    full = measure("full", (2, 2, 20))
    no_l2 = measure("levels01_only", (2, 2, 0))
    l2 = measure("level2_only", (0, 0, 20))
    l0 = measure("level0_only", (2, 0, 0))
    l1 = measure("level1_only", (0, 2, 0))
    base = measure("stem_pools_only", (0, 0, 0))
    print(f"\nstem/pools ~{base:.1f} ms; l0-attn ~{l0 - base:.1f}; "
          f"l1-attn ~{l1 - base:.1f}; l2-attn ~{l2 - base:.1f}; "
          f"sum={base + (l0 - base) + (l1 - base) + (l2 - base):.1f} "
          f"vs full={full:.1f}")


if __name__ == "__main__":
    main()
