#!/usr/bin/env python
"""ResNet50 step-time probe: why is the bottleneck backbone at 31% MFU?

ResNet50 backs two of the nine reference matrix rows (the torchxrayvision
finetune rows, reference README.md:145,150) yet measures 31.4% analytic
MFU vs ResNet34's 53.8% under the identical protocol. This probe measures
the candidate levers with the bench convention (batch 128, jitted 20-step
scan, min of 3, forced fetch) and writes benchmarks/resnet50_probe.json:

- baseline           cfg defaults (fp32 BatchNorm compute)
- bn_bf16            trainer.bn_dtype=bf16 (skips the fp32 cast round trip
                     around all 53 BNs; stats/params stay fp32)
- b256 / b256_bn_bf16  batch 256 (does the step starve at 128?)

Usage (real chip): python benchmarks/resnet50_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache", "tpu"))
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
    from vlp_tpu.utils.flops import analytic_flops

    B = int(os.environ.get("BENCH_BATCH", "128"))
    K = int(os.environ.get("BENCH_STEPS", "20"))
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
    rng = np.random.default_rng(0)
    out = {}

    def batches(b):
        return {
            "image_u8": jnp.asarray(rng.integers(
                0, 255, (K, b, 224, 224), dtype=np.uint8)),
            "label": jnp.zeros((K, b), jnp.int32),
            "mask": jnp.ones((K, b), jnp.float32),
            "dataset_id": jnp.tile(jnp.asarray(
                rng.integers(0, 2, b, dtype=np.int32)), (K, 1)),
            "clinical": jnp.zeros((K, b, 15), jnp.float32),
        }

    def run(name, bn_dtype="fp32", b=B):
        cfg = Config()
        cfg.model.task = "only_imaging"
        cfg.model.model = "resnet50"
        cfg.trainer.bn_dtype = bn_dtype
        cfg.data.batch_size = b
        task = build_task(cfg, TaskStatics(mean=128.0, std=30.0))
        bb = batches(b)
        one = {k: v[0] for k, v in bb.items()}
        variables = task.init_variables(jax.random.key(0), one)
        tx = make_optimizer(cfg, variables["params"], 100)
        state = TrainState.create(
            variables["params"],
            {k: v for k, v in variables.items() if k != "params"},
            tx, jax.random.key(1))
        step = make_scanned_train_step(task, tx, K, mesh=None)
        fwd = analytic_flops(
            lambda v, bt: task.eval_fn(v, bt)["loss"], variables, one)
        state, aux = step(state, bb)
        float(jax.device_get(aux["loss"][-1]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, aux = step(state, bb)
            float(jax.device_get(aux["loss"][-1]))
            ts.append(time.perf_counter() - t0)
        step_s = min(ts) / K
        rec = {"images_per_sec": round(b * K / min(ts), 1),
               "step_ms": round(step_s * 1e3, 2),
               "analytic_mfu_pct": round(100 * 3 * fwd / step_s / 1e12 /
                                         peak, 1)}
        out[name] = rec
        print(f"{name}: {rec}", flush=True)

    run("baseline")
    run("bn_bf16", bn_dtype="bf16")
    for name, dt in (("b256", "fp32"), ("b256_bn_bf16", "bf16")):
        try:
            run(name, bn_dtype=dt, b=256)
        except Exception as e:  # OOM at 256 is itself a result
            out[name] = {"error": str(e)[:200]}
            print(f"{name} FAILED: {str(e)[:120]}", flush=True)

    path = os.path.join(REPO, "benchmarks", "resnet50_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
