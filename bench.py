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


def tpu_only_kernel_checks() -> dict:
    """The 3 noise-kernel tests that skip on CPU (tests/test_pallas_noise.py
    TestGaussianNoiseKernel — Mosaic PRNG seeding + 16-bit unpack wiring)
    executed HERE on the real chip every bench run (VERDICT r3 #9), results
    recorded in the JSON sidecar so the TPU-only coverage is automated."""
    import traceback

    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        return {"ran": False, "reason": f"backend={jax.default_backend()}"}
    out: dict = {"ran": True}
    try:
        from vlp_tpu.ops.pallas_noise import add_gaussian_noise

        def draw(seed0, sigma=2.5, b=4, h=64, w=128):
            x = jnp.zeros((b, h, w), jnp.float32)
            seeds = jnp.arange(seed0, seed0 + b, dtype=jnp.int32)
            return np.asarray(jax.device_get(add_gaussian_noise(
                x, seeds, jnp.full((b,), sigma, jnp.float32))))

        a, b_, c = draw(7), draw(7), draw(99)
        flat = a.reshape(-1)
        z = flat / flat.std()
        out["moments"] = bool(abs(flat.mean()) < 0.05
                              and abs(flat.std() - 2.5) < 0.05
                              and abs((z ** 4).mean() - 3.0) < 0.2)
        out["deterministic_streams"] = bool(
            np.array_equal(a, b_) and not np.allclose(a[0], a[1])
            and not np.allclose(a, c))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
        y = add_gaussian_noise(x, jnp.arange(2, dtype=jnp.int32),
                               jnp.zeros(2))
        out["zero_sigma_identity"] = bool(
            np.array_equal(np.asarray(jax.device_get(y)), np.asarray(x)))
        out["passed"] = all(out[k] for k in ("moments",
                                             "deterministic_streams",
                                             "zero_sigma_identity"))
    except Exception:
        out["passed"] = False
        out["error"] = traceback.format_exc(limit=3)
    return out


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

    # sidecar: raw protocol config (ONE throughput convention shared with
    # benchmarks/run_benchmarks.py — VERDICT r3 #4) + the TPU-only kernel
    # checks (#9). stdout stays a single JSON line per the driver contract.
    sidecar = {
        "protocol": {
            "batch": batch_size, "steps_per_scan": steps,
            "repeats": repeats, "aggregate": "min",
            "measurement": "jitted lax.scan of K train steps, final loss "
                           "value-fetched (forced execution, one dispatch)",
            "model": cfg.model.model, "text_model": cfg.model.text_model,
        },
        "images_per_sec": round(images_per_sec, 2),
        "all_times_s": [round(t, 4) for t in times],
        "tpu_kernel_checks": tpu_only_kernel_checks(),
    }
    sidecar_path = os.environ.get(
        "BENCH_SIDECAR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "benchmarks", "bench_sidecar.json"))

    def write_sidecar():
        try:
            with open(sidecar_path, "w") as fh:
                json.dump(sidecar, fh, indent=2)
        except OSError:
            pass

    # metric line + scan-only sidecar FIRST: the trainer-loop phase below
    # runs a second full model in this process — if it dies (OOM on the
    # shared 16 GB chip), the already-valid scan measurement must survive.
    write_sidecar()
    print(json.dumps({
        "metric": "vlp_pretrain_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / REFERENCE_GPU_IMAGES_PER_SEC, 3),
    }), flush=True)

    # Delivered-loop invariant (VERDICT r4 #8): the REAL Trainer.fit path
    # must stay within 3% of this scan microbenchmark — re-verified every
    # bench run and recorded in the sidecar. >= 4 epochs (r4 #7) so the
    # claim doesn't rest on one post-compile epoch. measure_trainer_loop
    # pins the DEFAULT resnet34/tinybert workload, so the ratio is only
    # meaningful (and only asserted) when the scan above measured the same
    # model — a BENCH_MODEL override would compare apples to oranges.
    default_model = (cfg.model.model == "resnet34"
                     and cfg.model.text_model == "tinybert")
    if os.environ.get("BENCH_TRAINER_RATIO", "1") == "1" and default_model:
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        from trainer_loop_bench import measure_trainer_loop

        trainer_loop = measure_trainer_loop(batch=batch_size,
                                            scan_steps=steps)
        ratio = trainer_loop["images_per_sec"] / images_per_sec
        sidecar["trainer_loop"] = trainer_loop
        sidecar["delivered_loop_ratio"] = round(ratio, 4)
        sidecar["delivered_loop_ok"] = bool(ratio >= 0.97)
        write_sidecar()
        # asserted AFTER the metric line is on stdout so a regression fails
        # loudly without losing the measurement
        assert ratio >= 0.97, (
            f"delivered Trainer.fit loop regressed to {100 * ratio:.1f}% of "
            f"the scan microbenchmark ({trainer_loop['images_per_sec']} vs "
            f"{images_per_sec:.0f} img/s; invariant: >= 97%)")


if __name__ == "__main__":
    main()
