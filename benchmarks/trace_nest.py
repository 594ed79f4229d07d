#!/usr/bin/env python
"""Capture a device trace of the NesT train step and print the HLO-op time
breakdown (xprof hlo_stats) — finds where backward time actually goes."""
from __future__ import annotations

import glob
import json
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
    K = int(os.environ.get("BENCH_STEPS", "5"))
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((K, B, 224, 224, 3)), jnp.bfloat16)

    model = NesT(depths=tuple(int(d) for d in os.environ.get(
        "PROF_DEPTHS", "2,2,20").split(",")),
        fused_attention=os.environ.get("PROF_FUSED", "0") == "1")
    params = model.init(jax.random.key(0), xs[0, :2])

    def loss_fn(p, x):
        return jnp.mean(model.apply(p, x).astype(jnp.float32))

    @jax.jit
    def steps(p, xs):
        def body(p, x):
            l, g = jax.value_and_grad(loss_fn)(p, x)
            # real SGD-ish update -> params are loop-carried, nothing is
            # loop-invariant, no LICM ambiguity
            p = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
            return p, l
        p, ls = jax.lax.scan(body, p, xs)
        return p, ls

    p2, ls = steps(params, xs)
    float(jax.device_get(ls[-1]))  # compile + warm
    t0 = time.perf_counter()
    p2, ls = steps(params, xs)
    float(jax.device_get(ls[-1]))
    dt = time.perf_counter() - t0
    print(f"train(real update): {dt / K * 1e3:.2f} ms/step "
          f"({B * K / dt:.0f} img/s)", flush=True)

    trace_dir = os.environ.get("PROF_TRACE_DIR", "/tmp/nest_trace")
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        p2, ls = steps(params, xs)
        float(jax.device_get(ls[-1]))
    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data(xplanes, "hlo_stats", {})
    out = os.environ.get("PROF_OUT", "/tmp/nest_hlo_stats.json")
    with open(out, "wb") as fh:
        fh.write(data if isinstance(data, bytes) else data.encode())
    print(f"wrote {out} ({len(data)} bytes)", flush=True)


if __name__ == "__main__":
    main()
