#!/usr/bin/env python
"""Delivered Trainer.fit on an 8-device CPU mesh with the device-resident
corpus — the multi-chip analogue of the ``trainer_loop`` entry.

Proves the full delivered path (driver -> DeviceLoader resident assemble ->
scanned train step -> scanned validation) executes under a data mesh with
the resident corpus ENGAGED (r2 disabled it under any mesh). Throughput on
virtual CPU devices is not meaningful as a speed number and is recorded
only to show the run completed; the byte-identity of resident batches vs
the host path is covered by tests/test_resident_mesh.py.

Run: python benchmarks/trainer_loop_mesh8.py   (forces JAX_PLATFORMS=cpu,8)
"""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_use_thunk_runtime" not in flags:
    # sequential runtime: thunk work-stealing can deadlock independent
    # collectives across device threads (DESIGN.md §7c)
    flags = (flags + " --xla_cpu_use_thunk_runtime=false").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

from vlp_tpu.utils.cache import host_scoped_cache_dir  # noqa: E402

os.environ["JAX_COMPILATION_CACHE_DIR"] = host_scoped_cache_dir(
    os.path.join(ROOT, ".jax_cache"), "cpu_dryrun")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> None:
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    assert len(jax.devices()) == 8, jax.devices()

    from vlp_tpu.config import apply_overrides, get_experiment
    from vlp_tpu.train.driver import train as driver_train

    cfg = get_experiment("smoke_synthetic_pretrain")
    cfg = apply_overrides(cfg, [
        "model.model=resnet_micro", "model.text_model=microbert",
        "data.image_size=32", "data.batch_size=16",
        "data.eval_batch_size=16", "data.max_token_length=8",
        "data.synthetic_num_samples=96",
        "downstream_data.synthetic_num_samples=32",
        "downstream_data.image_size=32", "downstream_data.batch_size=16",
        "downstream_data.eval_batch_size=16",
        "trainer.max_epochs=2", "trainer.precision=fp32",
        "trainer.scan_steps=2",
    ])
    cfg.output_dir = tempfile.mkdtemp(prefix="bench_mesh8_")
    agg = driver_train(cfg)
    ips_key = [k for k in agg if k.endswith("train/images_per_sec_mean")]
    ips = float(agg[ips_key[0]]) if ips_key else 0.0

    out_path = os.path.join(ROOT, "benchmarks", "results.json")
    res = json.load(open(out_path)) if os.path.exists(out_path) else {}
    res["trainer_loop_mesh8"] = {
        "images_per_sec_cpu8": round(ips, 1),
        "note": "delivered Trainer.fit on an 8-virtual-CPU-device mesh "
                "with the device-resident corpus engaged; completion + "
                "resident-path proof, not a speed number",
    }
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=2)
    print(f"trainer_loop_mesh8: OK ({ips:.1f} img/s on cpu-8); wrote "
          f"{out_path}", flush=True)


if __name__ == "__main__":
    main()
