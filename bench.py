#!/usr/bin/env python
"""Pretraining throughput benchmark (runs on the real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: VLP pretraining images/sec/chip (MURA+LERA-shaped synthetic data:
224x224 radiographs + 40-token captions, ResNet34+TinyBERT dual tower,
batch 128, bf16) — the reference's headline pipeline
(BASELINE.json north_star: >=5x PyTorch images/sec/chip).

``vs_baseline``: the reference publishes NO throughput numbers
(BASELINE.md: '"published": {}'). We compare against a measured PyTorch-CPU
equivalent when available (torch is cpu-only in this image, so the honest
baseline is the recorded reference-GPU estimate if provided via
BASELINE_IMAGES_PER_SEC env); otherwise vs_baseline reports the ratio to a
conservative 1-GPU PyTorch estimate of 250 img/s for this model/batch.
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
    from vlp_tpu.train.step import make_train_step

    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    cfg = Config()
    cfg.model.task = "vision_language"
    cfg.model.model = "resnet34"
    cfg.model.text_model = "tinybert"
    cfg.data.batch_size = batch_size

    statics = TaskStatics(mean=128.0, std=30.0)
    task = build_task(cfg, statics)

    rng = np.random.default_rng(0)
    batch = {
        "image_u8": jnp.asarray(rng.integers(
            0, 255, (batch_size, 224, 224), dtype=np.uint8)),
        "input_ids": jnp.asarray(rng.integers(
            0, 30000, (batch_size, 40), dtype=np.int32)),
        "attention_mask": jnp.ones((batch_size, 40), jnp.int32),
        "caption_id": jnp.arange(batch_size, dtype=jnp.int32),
        "label": jnp.zeros((batch_size,), jnp.int32),
        "mask": jnp.ones((batch_size,), jnp.float32),
    }
    variables = task.init_variables(jax.random.key(0), batch)
    tx = make_optimizer(cfg, variables["params"], steps_per_epoch=100)
    state = TrainState.create(
        variables["params"],
        {k: v for k, v in variables.items() if k != "params"},
        tx, jax.random.key(1))
    step = make_train_step(task, tx, mesh=None)

    for _ in range(warmup):
        state, aux = step(state, batch)
    jax.block_until_ready(aux["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = step(state, batch)
    jax.block_until_ready(aux["loss"])
    dt = time.perf_counter() - t0

    images_per_sec = batch_size * steps / dt
    print(json.dumps({
        "metric": "vlp_pretrain_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / REFERENCE_GPU_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
