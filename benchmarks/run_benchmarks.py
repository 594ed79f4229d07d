#!/usr/bin/env python
"""Benchmark suite: records throughput for the main workloads on the current
device into benchmarks/results.json. The reference has no benchmarks at all
(SURVEY.md §6) — these numbers define the baseline.

Workloads (all 224x224, bf16 compute, on-device augmentation where noted):
- vlp_train:        VLP dual-tower (ResNet34+TinyBERT) train step, batch 128
- classifier_train: OnlyImaging ResNet34 train step (weighted BCE+CORAL)
- fusion_train:     Fusion ResNet34 train step
- classifier_infer: OnlyImaging ResNet34 inference (eval_fn)
- augmentation:     fused augment+normalize alone

Methodology: K steps inside one jitted lax.scan; final VALUE fetched (forced
execution, single dispatch). See bench.py docstring for why.
"""
from __future__ import annotations

import json
import os
import platform
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache", "tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# Entry name -> model-config overrides applied to Config().model — the
# SINGLE SOURCE OF TRUTH shared with patch_mfu.py's offline CPU FLOPs
# re-annotation: adding or changing an entry here updates both the timed
# run and the re-annotation (hand-copied tables silently diverge).
TRAIN_ENTRIES = {
    "vlp_train": {"task": "vision_language", "model": "resnet34",
                  "text_model": "tinybert"},
    "classifier_train": {"task": "only_imaging", "model": "resnet34",
                         "coral_lambda": 1000.0},
    "fusion_train": {"task": "fusion", "model": "resnet34"},
}
# default = Pallas fused block kernels (the shipped path); _unfused pins
# the plain-XLA variant for the before/after record
BACKBONE_ENTRIES = {
    "backbone_nest_small": {"task": "only_imaging", "model": "nest_small"},
    "backbone_nest_small_unfused": {
        "task": "only_imaging", "model": "nest_small",
        "fused_attention": False},
    "backbone_vit_base": {"task": "only_imaging",
                          "model": "vit_base_patch16_224"},
    "backbone_vit_base_unfused": {
        "task": "only_imaging", "model": "vit_base_patch16_224",
        "fused_attention": False},
    # ViT-L train at batch 128 only fits the 16 GB chip with per-block
    # remat (model.remat; without it the AOT compile aborts at B >= 48)
    "backbone_vit_large": {"task": "only_imaging",
                           "model": "vit_large_patch16_224", "remat": True},
    "backbone_resnet50": {"task": "only_imaging", "model": "resnet50"},
}


def mfu_convention(peak_tflops: float) -> str:
    """The FLOPs columns' convention note — built from the SAME peak used
    to compute the mfu columns so note and columns can never disagree
    (shared with patch_mfu.py's offline re-annotation)."""
    return (
        "analytic_* fields are TRUE MFU (VERDICT r3 #3): FLOPs = 3x the "
        "forward's textbook 2*MAC count (vlp_tpu/utils/flops.py jaxpr "
        "walk over dot/conv equations — validated against timm GMACs in "
        "tests/test_flops.py; train = fwd + bwd ~ 3x fwd, the 6ND "
        "convention; no augmentation/optimizer FLOPs). QUOTE "
        "analytic_mfu_pct as MFU. hlo_* fields: XLA cost analysis of the "
        "full pure-XLA train step (VLP_DISABLE_PALLAS) — through jax 0.8 "
        "the unoptimized-HLO count (~2x analytic: generous conv-backward "
        "accounting), from jax 0.9 the COMPILED module's count (lowered "
        "analysis was removed; agrees with analytic within a few %% on "
        "these models) — regression tracking only, convention shifted "
        "with the jax upgrade. Entries with model.remat=True (ViT-L) "
        "EXECUTE ~4x-fwd FLOPs (per-block recompute) but are still "
        "quoted at the useful 3x-fwd convention — their analytic_mfu "
        "understates hardware utilization by ~25%%. "
        "Peak = %g TFLOP/s bf16." % peak_tflops)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlp_tpu.config import Config
    from vlp_tpu.models.tasks import TaskStatics, build_task
    from vlp_tpu.ops.augment import AugmentConfig, augment_and_normalize
    from vlp_tpu.train.optim import make_optimizer
    from vlp_tpu.train.state import TrainState
    from vlp_tpu.train.step import make_scanned_train_step
    from vlp_tpu.utils.flops import analytic_flops

    B = int(os.environ.get("BENCH_BATCH", "128"))
    # K=20 matches bench.py EXACTLY (VERDICT r3 #4: one throughput
    # convention — same batch/steps/repeats/aggregate; the old K=10 runs
    # read ~6% lower purely from dispatch-overhead amortization: overhead
    # is ~37 ms per scan dispatch on the remote-PJRT tunnel, 1.85 ms/step
    # at K=20 vs 3.7 ms/step at K=10)
    K = int(os.environ.get("BENCH_STEPS", "20"))
    # MFU accounting (VERDICT r2 #9): model FLOPs from XLA's cost analysis
    # of the compiled module; peak from the device (v5e bf16 ~197 TFLOP/s),
    # overridable for other chips.
    peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))

    def module_flops(make_jitted, *args):
        """Total FLOPs of one call: XLA's unoptimized-HLO cost analysis of
        the PURE-XLA lowering. Custom calls (Pallas kernels) are opaque to
        the analysis, so ``make_jitted`` builds a FRESH jit wrapper which
        is traced under VLP_DISABLE_PALLAS=1 — model FLOPs are
        path-independent, and a fresh wrapper keeps the kill-switch trace
        out of the timed step's cache. jax>=0.9 returns None from the
        lowered (unoptimized-HLO) analysis, so fall back to the COMPILED
        module's count (persistent compile cache keeps re-runs cheap; the
        optimized count is the more accurate one anyway — exact 2*MAC for
        dots). The train-step count still includes augmentation/loss/
        optimizer/remat work — treat as the consistent HLO-flop
        convention, not the MFU numerator."""
        prior = os.environ.get("VLP_DISABLE_PALLAS")
        try:
            os.environ["VLP_DISABLE_PALLAS"] = "1"
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args)
            lowered = make_jitted().lower(*abstract)
            ca = lowered.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            if not ca or not ca.get("flops"):
                ca = lowered.compile().cost_analysis()
            f = ca.get("flops") if ca else None
            return float(f) if f and f > 0 else None
        except Exception:
            return None
        finally:
            # restore a user-set kill-switch rather than deleting it
            if prior is None:
                os.environ.pop("VLP_DISABLE_PALLAS", None)
            else:
                os.environ["VLP_DISABLE_PALLAS"] = prior
            # the kill-switch trace also populated NESTED module-level jit
            # caches (augment_and_normalize) with XLA-fallback jaxprs that
            # the timed run would silently reuse — drop every trace cache;
            # the persistent compile cache keeps recompiles cheap
            jax.clear_caches()

    def eff_fields(entry, flops_per_step, step_s, analytic_flops=None):
        if flops_per_step:
            tf = flops_per_step / step_s / 1e12
            entry["hlo_tflops_per_step"] = round(flops_per_step / 1e12, 3)
            entry["hlo_tflops_per_sec"] = round(tf, 1)
            entry["hlo_mfu_pct"] = round(100 * tf / peak_tflops, 1)
        if analytic_flops:
            tf = analytic_flops / step_s / 1e12
            entry["analytic_tflops_per_step"] = round(analytic_flops / 1e12,
                                                      3)
            entry["analytic_tflops_per_sec"] = round(tf, 1)
            entry["analytic_mfu_pct"] = round(100 * tf / peak_tflops, 1)
        return entry
    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]),
               "platform": platform.platform(),
               "batch_size": B, "steps_per_measurement": K,
               "protocol": {
                   "batch": B, "steps_per_scan": K, "repeats": 3,
                   "aggregate": "min",
                   "measurement": "jitted lax.scan of K steps, final value "
                                  "fetched (forced execution, one dispatch)",
                   "identical_to_bench_py": K == 20 and B == 128}}

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results.json")

    def checkpoint_results():
        """Merge + write after EVERY section: an exception (or preemption)
        in a later section must not lose an hour of TPU measurements."""
        merged = {}
        if os.path.exists(out_path):  # preserve entries other runs recorded
            with open(out_path) as fh:
                merged = json.load(fh)
            # superseded by the backbone_* real-optimizer entries
            merged.pop("backbone_train_images_per_sec", None)
        merged.update(results)
        merged["mfu_convention"] = mfu_convention(peak_tflops)
        with open(out_path, "w") as fh:
            json.dump(merged, fh, indent=2)

    def batches(task_kind, b=None):
        b = b or B
        base = {
            "image_u8": jnp.asarray(rng.integers(
                0, 255, (K, b, 224, 224), dtype=np.uint8)),
            "label": jnp.zeros((K, b), jnp.int32),
            "mask": jnp.ones((K, b), jnp.float32),
        }
        if task_kind == "vision_language":
            base.update({
                "input_ids": jnp.asarray(rng.integers(
                    0, 30000, (K, b, 40), dtype=np.int32)),
                "attention_mask": jnp.ones((K, b, 40), jnp.int32),
                "caption_id": jnp.tile(jnp.arange(b, dtype=jnp.int32), (K, 1)),
            })
        else:
            base.update({
                "dataset_id": jnp.tile(
                    jnp.asarray(rng.integers(0, 2, b, dtype=np.int32)), (K, 1)),
                "clinical": jnp.zeros((K, b, 15), jnp.float32),
            })
        return base

    def measure_train(name, task_cfg, batch=None, with_flops=True):
        b = batch or B
        cfg = Config()
        for k, v in task_cfg.items():
            setattr(cfg.model, k, v)
        cfg.data.batch_size = b
        task = build_task(cfg, TaskStatics(mean=128.0, std=30.0))
        bb = batches(cfg.model.task, b)
        one = {k: v[0] for k, v in bb.items()}
        variables = task.init_variables(jax.random.key(0), one)
        tx = make_optimizer(cfg, variables["params"], 100)
        state = TrainState.create(
            variables["params"],
            {k: v for k, v in variables.items() if k != "params"},
            tx, jax.random.key(1))
        step = make_scanned_train_step(task, tx, K, mesh=None)
        # flops from the UNSCANNED single-step lowering: cost analysis
        # counts a while-loop body once regardless of trip count
        from vlp_tpu.train.step import make_train_step as _mts

        flops = fwd = None
        if with_flops:
            flops = module_flops(lambda: _mts(task, tx, mesh=None),
                                 state, one)
            # analytic convention: textbook 2*MAC over the forward's
            # dot/conv equations (jaxpr walk — no augmentation, no
            # optimizer, no platform rewrites; validated against timm
            # GMACs in tests/test_flops.py); train = fwd + bwd ~ 3x fwd
            fwd = analytic_flops(
                lambda v, b: task.eval_fn(v, b)["loss"], variables, one)
        state, aux = step(state, bb)
        float(jax.device_get(aux["loss"][-1]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, aux = step(state, bb)
            float(jax.device_get(aux["loss"][-1]))
            ts.append(time.perf_counter() - t0)
        ips = b * K / min(ts)
        results[name] = eff_fields(
            {"images_per_sec": round(ips, 1),
             "step_ms": round(min(ts) / K * 1e3, 2)},
            flops, min(ts) / K, analytic_flops=3 * fwd if fwd else None)
        extra = ""
        if "hlo_mfu_pct" in results[name]:
            extra = (f", {results[name]['hlo_tflops_per_sec']} TF/s = "
                     f"{results[name]['hlo_mfu_pct']}% MFU")
        print(f"{name}: {ips:.0f} img/s ({min(ts)/K*1e3:.1f} ms/step{extra})",
              flush=True)

    def selected(name):
        """BENCH_FILTER=sub1,sub2 restricts entries by substring — lets a
        single new/changed entry re-measure without redoing the suite."""
        flt = os.environ.get("BENCH_FILTER", "")
        return not flt or any(s and s in name for s in flt.split(","))

    if os.environ.get("BENCH_TRAIN", "1") == "1":
        for name, task_cfg in TRAIN_ENTRIES.items():
            if selected(name):
                measure_train(name, task_cfg)
        checkpoint_results()

    # img/s-vs-batch curve for the headline VLP step (VERDICT r3 #7): the
    # remaining single-chip lever is input-level — record where throughput
    # saturates and whether HBM allows 256/512 with the resident corpus.
    if os.environ.get("BENCH_BATCH_SWEEP", "0") == "1":
        for b in (64, 128, 256, 512):
            try:
                # analytic FLOPs scale linearly in batch; patch_mfu.py
                # derives these entries' columns from vlp_train's, no
                # per-batch-size compile needed
                measure_train(f"vlp_train_b{b}", TRAIN_ENTRIES["vlp_train"],
                              batch=b, with_flops=False)
            except Exception as e:  # OOM at large batch is itself a result
                results[f"vlp_train_b{b}"] = {"error": str(e)[:300]}
                print(f"vlp_train_b{b}: FAILED ({str(e)[:120]})", flush=True)
        checkpoint_results()

    # transformer/large backbones through the same real-optimizer scan
    # (supersedes the hand-recorded backbone_train_images_per_sec entries);
    # nest is recorded with and without the Pallas fused block-attention
    if os.environ.get("BENCH_BACKBONES", "1") == "1":
        for name, task_cfg in BACKBONE_ENTRIES.items():
            if not selected(name):
                continue
            try:
                measure_train(name, task_cfg)
            except Exception as e:  # e.g. OOM on the largest backbone
                results[name] = {"error": str(e)[:300]}
                print(f"{name}: FAILED ({str(e)[:120]})", flush=True)
            checkpoint_results()

    if os.environ.get("BENCH_INFER", "1") == "1":
        # inference
        cfg = Config()
        cfg.model.task = "only_imaging"
        task = build_task(cfg, TaskStatics(mean=128.0, std=30.0))
        bb = batches("only_imaging")
        one = {k: v[0] for k, v in bb.items()}
        variables = task.init_variables(jax.random.key(0), one)

        def _infer_scan(v, bb):
            def body(c, b):
                return c + task.eval_fn(v, b)["loss"], ()
            out, _ = jax.lax.scan(body, jnp.float32(0), bb)
            return out

        infer_scan = jax.jit(_infer_scan)

        def _infer_one(v, b):
            return task.eval_fn(v, b)["loss"]

        infer_flops = module_flops(lambda: jax.jit(_infer_one), variables,
                                   one)
        out = infer_scan(variables, bb)
        float(jax.device_get(out))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.device_get(infer_scan(variables, bb)))
            ts.append(time.perf_counter() - t0)
        results["classifier_infer"] = eff_fields(
            {"images_per_sec": round(B * K / min(ts), 1),
             "step_ms": round(min(ts) / K * 1e3, 2)},
            infer_flops, min(ts) / K,
            # inference IS the forward pass: analytic = 1x forward 2*MAC
            analytic_flops=analytic_flops(_infer_one, variables, one))
        print(f"classifier_infer: {B*K/min(ts):.0f} img/s", flush=True)

        # augmentation alone
        key = jax.random.key(0)
        imgs = jnp.asarray(rng.integers(0, 255, (B, 224, 224), dtype=np.uint8))

        @jax.jit
        def aug_scan(c):
            def body(c, _):
                y = augment_and_normalize(c, key, jnp.float32(128.),
                                          jnp.float32(30.), AugmentConfig())
                return (y[..., 0] * 0).astype(jnp.uint8) + c, ()
            c, _ = jax.lax.scan(body, c, None, length=K)
            return c

        out = aug_scan(imgs)
        float(jax.device_get(out.reshape(-1)[0]))
        t0 = time.perf_counter()
        out = aug_scan(imgs)
        float(jax.device_get(out.reshape(-1)[0]))
        dt = (time.perf_counter() - t0) / K
        results["augmentation"] = {"images_per_sec": round(B / dt, 1),
                                   "step_ms": round(dt * 1e3, 2)}
        print(f"augmentation: {B/dt:.0f} img/s", flush=True)
        checkpoint_results()

    # val_epoch: scanned K-batch validation vs per-batch dispatch
    # (VERDICT r2 #6 acceptance: val-epoch wall time on record)
    if os.environ.get("BENCH_VAL", "1") == "1":
        from vlp_tpu.config import Config as _Cfg
        from vlp_tpu.data.datamodule import build_datamodule
        from vlp_tpu.models.tasks import build_task as _bt

        for k_scan, label in ((8, "val_epoch_scanned"),
                              (1, "val_epoch_per_batch")):
            from vlp_tpu.config import apply_overrides as _ao, \
                get_experiment as _ge
            from vlp_tpu.train.loop import Trainer as _Tr

            vcfg = _ge("smoke_synthetic_only_imaging")
            vcfg = _ao(vcfg, [
                "model.model=resnet34", "data.image_size=224",
                "data.batch_size=128", "data.eval_batch_size=128",
                # enough samples that each val loader holds ~20 batches —
                # the dispatch-bound regime scanned eval targets (tiny
                # loaders degenerate to the per-batch path anyway)
                f"data.synthetic_num_samples={100 * B}",
                f"trainer.scan_steps={k_scan}",
            ])
            dm = build_datamodule(vcfg, mesh=None)
            fold = next(dm.folds())
            task = _bt(vcfg, fold.statics)
            tr = _Tr(vcfg, task, fold.train_loader, fold.val_loaders)
            tr._validate(0)  # compile + warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                tr._validate(0)
                ts.append(time.perf_counter() - t0)
            results[label] = {"seconds": round(min(ts), 3)}
            print(f"{label}: {min(ts):.3f} s", flush=True)

        # VLP validation epoch: retrieval metrics over the full epoch's
        # embeddings, on-device masked top-k (VERDICT r3 #6 acceptance —
        # val-epoch wall seconds on record; the pre-r4 path device_get ->
        # host-concat -> re-upload'ed every chunk)
        from vlp_tpu.config import apply_overrides as _ao, \
            get_experiment as _ge
        from vlp_tpu.train.loop import Trainer as _Tr

        vcfg = _ge("smoke_synthetic_pretrain")
        vcfg = _ao(vcfg, [
            "model.model=resnet34", "model.text_model=tinybert",
            "data.image_size=224", "data.batch_size=128",
            "data.eval_batch_size=128", "data.max_token_length=40",
            f"data.synthetic_num_samples={40 * B}",
            "downstream_data.synthetic_num_samples=64",
            "trainer.scan_steps=8",
        ])
        dm = build_datamodule(vcfg, mesh=None)
        fold = next(dm.folds())
        task = _bt(vcfg, fold.statics)
        tr = _Tr(vcfg, task, fold.train_loader, fold.val_loaders)
        tr._validate_vlp()  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            tr._validate_vlp()
            ts.append(time.perf_counter() - t0)
        results["vlp_val_epoch_scanned"] = {"seconds": round(min(ts), 3)}
        print(f"vlp_val_epoch_scanned: {min(ts):.3f} s", flush=True)
        checkpoint_results()

    # trainer_loop: the DELIVERED Trainer.fit path (scanned K-step dispatch,
    # host pipeline, device prefetch) on synthetic 224px pretrain data —
    # must stay within ~10% of the vlp_train scan-microbenchmark number
    # (VERDICT r1 #4 acceptance).
    if os.environ.get("BENCH_TRAINER_LOOP", "1") == "1":
        from trainer_loop_bench import measure_trainer_loop

        nbatch = int(os.environ.get("BENCH_TRAINER_EPOCH_BATCHES", "200"))
        epochs = int(os.environ.get("BENCH_TRAINER_EPOCHS", "4"))
        results["trainer_loop"] = measure_trainer_loop(
            batch=B, scan_steps=K, epoch_batches=nbatch, max_epochs=epochs)
        base = results.get("vlp_train")
        if not base and os.path.exists(out_path):  # section-only run
            with open(out_path) as fh:
                base = json.load(fh).get("vlp_train")
        if base and "images_per_sec" in base:
            results["trainer_loop"]["pct_of_vlp_train"] = round(
                100 * results["trainer_loop"]["images_per_sec"]
                / base["images_per_sec"], 1)
        print(f"trainer_loop: {results['trainer_loop']['images_per_sec']:.0f}"
              f" img/s (epochs: "
              f"{results['trainer_loop']['images_per_sec_all_epochs']})",
              flush=True)

    checkpoint_results()
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
