#!/usr/bin/env python
"""Recompute the MFU/TFLOP columns of benchmarks/results.json on CPU.

FLOPs come from XLA's cost analysis of the PURE-XLA lowering
(VLP_DISABLE_PALLAS=1 — custom calls are opaque to the analysis; model
FLOPs are path-independent). jax>=0.9 removed the lowered-HLO analysis
(returns None), so this falls back to compiling the module on the CPU
host — slower than the old lower-only path but still never touches the
chip, so recorded step times from a TPU run can be re-annotated offline.
"""
from __future__ import annotations

import json
import os
import sys

os.environ["VLP_DISABLE_PALLAS"] = "1"
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vlp_tpu.config import Config
    from vlp_tpu.models.tasks import TaskStatics, build_task
    from vlp_tpu.train.optim import make_optimizer
    from vlp_tpu.train.state import TrainState
    from vlp_tpu.train.step import make_train_step
    from vlp_tpu.utils.flops import analytic_flops

    def flops_of(fn, abstract) -> float:
        """Cost-analysis flops of fn at abstract args: lowered analysis
        when the jax version still provides it, else the compiled
        module's (jax>=0.9)."""
        lowered = fn.lower(*abstract)
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if not ca or not ca.get("flops"):
            ca = lowered.compile().cost_analysis()
        return float(ca.get("flops", 0)) if ca else 0.0

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results.json")
    res = json.load(open(path))
    B = int(res.get("batch_size", 128))
    K = int(res.get("steps_per_measurement", 10))
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))

    # the entry -> config table is OWNED by run_benchmarks.py (the timed
    # run); importing it keeps this re-annotation from silently diverging
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_benchmarks import BACKBONE_ENTRIES, TRAIN_ENTRIES

    entries = {**TRAIN_ENTRIES, **BACKBONE_ENTRIES}
    # inference entry: eval_fn forward only
    if "classifier_infer" in res and "step_ms" in res["classifier_infer"]:
        cfg = Config()
        cfg.model.task = "only_imaging"
        task = build_task(cfg, TaskStatics(mean=128.0, std=30.0))
        one = {"image_u8": jnp.zeros((B, 224, 224), jnp.uint8),
               "label": jnp.zeros((B,), jnp.int32),
               "mask": jnp.ones((B,), jnp.float32),
               "dataset_id": jnp.zeros((B,), jnp.int32),
               "clinical": jnp.zeros((B, 15), jnp.float32)}
        variables = task.init_variables(jax.random.key(0), one)
        fn = jax.jit(lambda v, b: task.eval_fn(v, b)["loss"])
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (variables, one))
        f = 0.0
        step_s = res["classifier_infer"]["step_ms"] / 1e3
        if "hlo_tflops_per_step" not in res["classifier_infer"]:
            f = flops_of(fn, abstract)  # see hlo note below: fill-if-missing
            if f > 0:
                tf = f / step_s / 1e12
                res["classifier_infer"].update(
                    hlo_tflops_per_step=round(f / 1e12, 3),
                    hlo_tflops_per_sec=round(tf, 1),
                    hlo_mfu_pct=round(100 * tf / peak, 1))
        # inference IS the forward pass: analytic = 1x forward 2*MAC
        fa = analytic_flops(lambda v, b: task.eval_fn(v, b)["loss"],
                            variables, one)
        if fa > 0:
            tfa = fa / step_s / 1e12
            res["classifier_infer"].update(
                analytic_tflops_per_step=round(fa / 1e12, 3),
                analytic_tflops_per_sec=round(tfa, 1),
                analytic_mfu_pct=round(100 * tfa / peak, 1))
        print(f"classifier_infer: hlo {f/1e12:.3f} / analytic "
              f"{fa/1e12:.3f} TF/step", flush=True)

    rng = np.random.default_rng(0)
    for name, task_cfg in entries.items():
        if name not in res or "step_ms" not in res[name]:
            continue
        cfg = Config()
        for k, v in task_cfg.items():
            setattr(cfg.model, k, v)
        task = build_task(cfg, TaskStatics(mean=128.0, std=30.0))
        bb = {
            "image_u8": jnp.zeros((K, B, 224, 224), jnp.uint8),
            "label": jnp.zeros((K, B), jnp.int32),
            "mask": jnp.ones((K, B), jnp.float32),
        }
        if cfg.model.task == "vision_language":
            bb.update({
                "input_ids": jnp.ones((K, B, 40), jnp.int32),
                "attention_mask": jnp.ones((K, B, 40), jnp.int32),
                "caption_id": jnp.tile(jnp.arange(B, dtype=jnp.int32),
                                       (K, 1)),
            })
        else:
            bb.update({
                "dataset_id": jnp.tile(jnp.asarray(
                    rng.integers(0, 2, B, dtype=np.int32)), (K, 1)),
                "clinical": jnp.zeros((K, B, 15), jnp.float32),
            })
        one = {k: v[0] for k, v in bb.items()}
        variables = task.init_variables(jax.random.key(0), one)
        tx = make_optimizer(cfg, variables["params"], 100)
        state = TrainState.create(
            variables["params"],
            {k: v for k, v in variables.items() if k != "params"},
            tx, jax.random.key(1))
        step_s = res[name]["step_ms"] / 1e3
        # hlo columns: only fill if MISSING — a TPU bench run records them
        # from the on-device compiled module; recompiling here on CPU
        # (slow, platform-rewritten differently) would silently replace
        # them with an inconsistent count
        f = 0.0
        if "hlo_tflops_per_step" not in res[name]:
            # UNSCANNED step: cost analysis counts a while-loop body once
            # regardless of trip count, so lower the single-step program
            step = make_train_step(task, tx, mesh=None)
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                (state, one))
            f = flops_of(step, abstract)  # per step
            if f > 0:
                tf = f / step_s / 1e12
                res[name]["hlo_tflops_per_step"] = round(f / 1e12, 3)
                res[name]["hlo_tflops_per_sec"] = round(tf, 1)
                res[name]["hlo_mfu_pct"] = round(100 * tf / peak, 1)
        # analytic convention (VERDICT r3 #3): textbook 2*MAC over the
        # forward's dot/conv equations, x3 for fwd+bwd — the 6ND
        # convention. QUOTE THIS as MFU.
        fwd = analytic_flops(lambda v, b: task.eval_fn(v, b)["loss"],
                             variables, one)
        extra = ""
        if fwd > 0:
            atf = 3 * fwd / step_s / 1e12
            res[name]["analytic_tflops_per_step"] = round(3 * fwd / 1e12, 3)
            res[name]["analytic_tflops_per_sec"] = round(atf, 1)
            res[name]["analytic_mfu_pct"] = round(100 * atf / peak, 1)
            extra = f"analytic {3*fwd/1e12:.3f} TF/step = " \
                    f"{100*atf/peak:.1f}% MFU"
        print(f"{name}: {extra or 'no analytic count'}"
              + (f" (hlo filled: {f/1e12:.3f} TF/step)" if f > 0 else ""),
              flush=True)
    # batch-sweep entries (vlp_train_b64/...): analytic FLOPs scale
    # linearly in batch, so derive from the annotated vlp_train (B) entry
    # instead of paying a compile per batch size
    base = res.get("vlp_train", {})
    if "analytic_tflops_per_step" in base:
        per_img = base["analytic_tflops_per_step"] / B
        for name, entry in res.items():
            if (name.startswith("vlp_train_b") and isinstance(entry, dict)
                    and "step_ms" in entry):
                b = int(name.rsplit("b", 1)[1])
                tf_step = per_img * b
                atf = tf_step / (entry["step_ms"] / 1e3)
                entry["analytic_tflops_per_step"] = round(tf_step, 3)
                entry["analytic_tflops_per_sec"] = round(atf, 1)
                entry["analytic_mfu_pct"] = round(100 * atf / peak, 1)
    # rewrite the convention note with THE peak these columns were just
    # computed with (a preserved note would go stale under an overridden
    # BENCH_PEAK_TFLOPS)
    from run_benchmarks import mfu_convention

    res["mfu_convention"] = mfu_convention(peak)
    with open(path, "w") as fh:
        json.dump(res, fh, indent=2)
    print(f"patched {path}")


if __name__ == "__main__":
    main()
