#!/usr/bin/env python
"""Capture a device trace of a full task train step (the bench.py path:
scanned steps, real optimizer) and dump the xprof hlo_stats table.

Usage: TRACE_TASK=vision_language TRACE_MODEL=resnet34 python
benchmarks/trace_step.py  -> /tmp/step_hlo_stats.json
"""
from __future__ import annotations

import glob
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

    from vlp_tpu.config import Config
    from vlp_tpu.models.tasks import TaskStatics, build_task
    from vlp_tpu.train.optim import make_optimizer
    from vlp_tpu.train.state import TrainState
    from vlp_tpu.train.step import make_scanned_train_step

    B = int(os.environ.get("BENCH_BATCH", "128"))
    K = int(os.environ.get("BENCH_STEPS", "5"))
    rng = np.random.default_rng(0)

    cfg = Config()
    cfg.model.task = os.environ.get("TRACE_TASK", "vision_language")
    cfg.model.model = os.environ.get("TRACE_MODEL", "resnet34")
    cfg.model.text_model = os.environ.get("TRACE_TEXT", "tinybert")

    bb = {
        "image_u8": jnp.asarray(rng.integers(
            0, 255, (K, B, 224, 224), dtype=np.uint8)),
        "label": jnp.zeros((K, B), jnp.int32),
        "mask": jnp.ones((K, B), jnp.float32),
    }
    if cfg.model.task == "vision_language":
        bb.update({
            "input_ids": jnp.asarray(rng.integers(
                0, 30000, (K, B, 40), dtype=np.int32)),
            "attention_mask": jnp.ones((K, B, 40), jnp.int32),
            "caption_id": jnp.tile(jnp.arange(B, dtype=jnp.int32), (K, 1)),
        })
    else:
        bb.update({
            "dataset_id": jnp.tile(jnp.asarray(
                rng.integers(0, 2, B, dtype=np.int32)), (K, 1)),
            "clinical": jnp.zeros((K, B, 15), jnp.float32),
        })

    task = build_task(cfg, TaskStatics(mean=128.0, std=30.0))
    one = {k: v[0] for k, v in bb.items()}
    variables = task.init_variables(jax.random.key(0), one)
    tx = make_optimizer(cfg, variables["params"], 100)
    state = TrainState.create(
        variables["params"],
        {k: v for k, v in variables.items() if k != "params"},
        tx, jax.random.key(1))
    step = make_scanned_train_step(task, tx, K, mesh=None)
    state, aux = step(state, bb)
    float(jax.device_get(aux["loss"][-1]))
    t0 = time.perf_counter()
    state, aux = step(state, bb)
    float(jax.device_get(aux["loss"][-1]))
    dt = time.perf_counter() - t0
    print(f"{cfg.model.task}/{cfg.model.model}: {dt / K * 1e3:.2f} ms/step "
          f"({B * K / dt:.0f} img/s)", flush=True)

    trace_dir = os.environ.get("TRACE_DIR", "/tmp/step_trace")
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        state, aux = step(state, bb)
        float(jax.device_get(aux["loss"][-1]))
    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data(xplanes, "hlo_stats", {})
    out = os.environ.get("TRACE_OUT", "/tmp/step_hlo_stats.json")
    with open(out, "wb") as fh:
        fh.write(data if isinstance(data, bytes) else data.encode())
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
