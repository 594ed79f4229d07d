#!/usr/bin/env python
"""NesT diagnosis round 2: fwd-only vs train, remat, attention variants."""
from __future__ import annotations

import functools
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

    def bench(fn, *args):
        f = jax.jit(fn)
        float(jax.device_get(f(*args)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.device_get(f(*args)))
            ts.append(time.perf_counter() - t0)
        return min(ts) / K * 1e3

    def scan_train(model, params, remat=False):
        apply = model.apply
        if remat:
            apply = jax.checkpoint(model.apply)

        def loss_fn(p, x):
            return jnp.mean(apply(p, x).astype(jnp.float32))

        def step(p, x):
            def body(c, _):
                l, g = jax.value_and_grad(loss_fn)(p, x)
                return c + l + jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b).astype(jnp.float32), g, 0.0), ()
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return out
        return step

    def scan_fwd(model, params):
        def step(p, x):
            def body(c, _):
                return c + jnp.mean(model.apply(p, x).astype(jnp.float32)), ()
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return out
        return step

    do_remat = os.environ.get("PROF_REMAT", "0") == "1"
    for name, depths in [("full", (2, 2, 20)), ("levels01", (2, 2, 0)),
                         ("level2", (0, 0, 20))]:
        model = NesT(depths=depths)
        params = model.init(jax.random.key(0), x[:2])
        fwd = bench(scan_fwd(model, params), params, x)
        print(f"{name:10s}: fwd {fwd:7.2f} ms", flush=True)
        trn = bench(scan_train(model, params), params, x)
        print(f"{name:10s}: train {trn:7.2f} ms", flush=True)
        if do_remat:
            rmt = bench(scan_train(model, params, remat=True), params, x)
            print(f"{name:10s}: train+remat {rmt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
