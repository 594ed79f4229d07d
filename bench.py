#!/usr/bin/env python
"""Pretraining throughput benchmark (runs on the real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: VLP pretraining images/sec/chip (MURA+LERA-shaped synthetic data:
224x224 radiographs + 40-token captions, ResNet34+TinyBERT dual tower,
batch 128, bf16, on-device augmentation included) — the reference's headline
pipeline (BASELINE.json north_star: >=5x PyTorch images/sec/chip).

Methodology: the K timed steps run INSIDE one jitted ``lax.scan``
(vlp_tpu.train.step.make_scanned_train_step) and the final loss VALUE is
fetched, so the measurement is a single dispatch with forced execution —
immune to both per-dispatch round-trip overhead and async-ack artifacts of
remote PJRT transports (block_until_ready proved unreliable through the
tunnel; value fetches cannot lie).

``vs_baseline``: the reference publishes NO throughput numbers
(BASELINE.md '"published": {}'). vs_baseline is the ratio to a conservative
single-GPU PyTorch estimate of 250 img/s for this model/batch, overridable
via BASELINE_IMAGES_PER_SEC.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache",
                 "tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REFERENCE_GPU_IMAGES_PER_SEC = float(
    os.environ.get("BASELINE_IMAGES_PER_SEC", "250"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlp_tpu.config import Config
    from vlp_tpu.models.tasks import TaskStatics, build_task
    from vlp_tpu.train.optim import make_optimizer
    from vlp_tpu.train.state import TrainState
    from vlp_tpu.train.step import make_scanned_train_step

    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    cfg = Config()
    cfg.model.task = "vision_language"
    cfg.model.model = os.environ.get("BENCH_MODEL", "resnet34")
    cfg.model.text_model = "tinybert"
    cfg.data.batch_size = batch_size

    task = build_task(cfg, TaskStatics(mean=128.0, std=30.0))

    rng = np.random.default_rng(0)
    batches = {
        "image_u8": jnp.asarray(rng.integers(
            0, 255, (steps, batch_size, 224, 224), dtype=np.uint8)),
        "input_ids": jnp.asarray(rng.integers(
            0, 30000, (steps, batch_size, 40), dtype=np.int32)),
        "attention_mask": jnp.ones((steps, batch_size, 40), jnp.int32),
        "caption_id": jnp.tile(jnp.arange(batch_size, dtype=jnp.int32),
                               (steps, 1)),
        "label": jnp.zeros((steps, batch_size), jnp.int32),
        "mask": jnp.ones((steps, batch_size), jnp.float32),
    }
    one = {k: v[0] for k, v in batches.items()}
    variables = task.init_variables(jax.random.key(0), one)
    tx = make_optimizer(cfg, variables["params"], steps_per_epoch=100)
    state = TrainState.create(
        variables["params"],
        {k: v for k, v in variables.items() if k != "params"},
        tx, jax.random.key(1))
    multi_step = make_scanned_train_step(task, tx, steps, mesh=None)

    # warmup (compile) + correctness guard
    state, aux = multi_step(state, batches)
    final = float(jax.device_get(aux["loss"][-1]))
    assert final == final, "NaN loss"

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, aux = multi_step(state, batches)
        float(jax.device_get(aux["loss"][-1]))  # forced execution
        times.append(time.perf_counter() - t0)
    dt = min(times)
    images_per_sec = batch_size * steps / dt
    print(json.dumps({
        "metric": "vlp_pretrain_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / REFERENCE_GPU_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
