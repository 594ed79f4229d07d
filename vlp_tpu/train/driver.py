"""K-fold cross-validation driver + CLI entry point.

Mirrors the reference's train() flow (src/train.py:56-257): seed, build
datamodule, per-fold instantiate task/trainer (label weights injected into
the task), fit, harvest metrics-at-best-epoch from the summary snapshot,
aggregate mean/std across folds, and — for VLP runs — wire the downstream
linear-probe callback (src/train.py:126-135) and the post-fit downstream
precision@k evaluation from the best checkpoint (src/train.py:187-211).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import numpy as np

from vlp_tpu.config import Config, apply_overrides
from vlp_tpu.data.datamodule import DownstreamData, build_datamodule
from vlp_tpu.models.tasks import build_task
from vlp_tpu.parallel.mesh import create_mesh
from vlp_tpu.train.callbacks import DownstreamPrecisionAtK, LinearProbeCallback
from vlp_tpu.train.loop import Trainer
from vlp_tpu.utils import checkpoint as ckpt
from vlp_tpu.utils.logging import JsonlSink, MemorySink, MultiSink, get_logger

logger = get_logger(__name__)


def _maybe_warm_start(cfg: Config, trainer: Trainer) -> None:
    """VLP-checkpoint warm start: graft the image-encoder subtree into the
    classifier backbone (reference OnlyImagingModule.py:75-98); or, for the
    torchxrayvision path, import the pretrained torch ResNet50 weights
    (reference OnlyImagingModule.py:55-69)."""
    if cfg.model.pretrained and cfg.model.model == "resnet50-res512-all":
        from vlp_tpu.models.torch_import import load_torchxrayvision_resnet50

        params = trainer.state.params
        bs = trainer.state.extra_vars.get("batch_stats", {})
        loaded = load_torchxrayvision_resnet50(
            params.get("backbone", params),
            bs.get("backbone", bs),
            weights_path=os.environ.get("XRV_WEIGHTS_PATH"))
        if loaded is not None:
            new_p, new_b = loaded
            params = dict(params)
            params["backbone"] = new_p
            extra = dict(trainer.state.extra_vars)
            new_bs = dict(bs)
            new_bs["backbone"] = new_b
            extra["batch_stats"] = new_bs
            trainer.state = trainer.state.replace(params=params,
                                                  extra_vars=extra)
            logger.info("Loaded torchxrayvision resnet50 weights")
    path = cfg.model.pretrained_ckpt
    if not path:
        return
    if path.startswith("REQUIRED:"):
        raise ValueError(
            f"experiment {cfg.experiment!r} needs model.pretrained_ckpt "
            "pointing at a VLP checkpoint (override it on the CLI)")
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    # raw restore: the checkpoint carries the PRODUCER's (VLP) tree, which
    # differs from this classifier's tree
    tree = ckpt.restore_raw(path)
    vlp_params = tree["params"]
    encoder = (ckpt.extract_image_encoder(vlp_params)
               if "image_encoder" in vlp_params else vlp_params.get("backbone"))
    new_params = ckpt.graft_backbone(trainer.state.params, encoder)
    extra = dict(trainer.state.extra_vars)
    # BN running statistics ride along with the encoder (the reference's
    # strict=False load carries them too)
    src_bs = tree.get("extra_vars", {}).get("batch_stats", {})
    src_bs = src_bs.get("image_encoder", src_bs.get("backbone"))
    if src_bs and "batch_stats" in extra and "backbone" in extra["batch_stats"]:
        bs = dict(extra["batch_stats"])
        bs["backbone"] = src_bs
        extra["batch_stats"] = bs
    trainer.state = trainer.state.replace(params=new_params, extra_vars=extra)
    logger.info("Warm-started backbone (+BN stats) from %s", path)


def _maybe_load_pretrained_text_tower(cfg: Config, trainer: Trainer) -> None:
    """Import pretrained HF DistilBERT/TinyBERT weights into the text tower
    when locally cached (the reference's text encoders are always pretrained,
    VisionLanguageModule.py:38-60; zero-egress environments fall back to
    random init with a loud log)."""
    from vlp_tpu.models.bert import load_hf_weights

    params = trainer.state.params
    if "text_encoder" not in params:
        return
    converted = load_hf_weights(params["text_encoder"], cfg.model.text_model)
    if converted is None:
        return
    from vlp_tpu.data.tokenize import tokenizer_is_hash_fallback

    if tokenizer_is_hash_fallback(cfg.data.tokenizer):
        raise RuntimeError(
            f"pretrained {cfg.model.text_model} weights are available but "
            f"tokenizer {cfg.data.tokenizer!r} fell back to the hash "
            "tokenizer: hash-vocab token ids into a pretrained BERT "
            "produce garbage. Stage the HF tokenizer files locally or run "
            "the text tower from scratch.")
    new_params = dict(params)
    new_params["text_encoder"] = converted
    trainer.state = trainer.state.replace(params=new_params)
    logger.info("Loaded pretrained %s text-tower weights",
                cfg.model.text_model)


def _linear_probe_callback(cfg: Config, mesh, downstream: DownstreamData,
                           every_n: int, vlp_task):
    """Build the probe over the FIRST downstream CV split's loaders
    (reference src/train.py:126-135). Features come from the VLP image
    tower applied with the DOWNSTREAM fold's normalization statics."""
    import copy

    fold = next(downstream.folds())
    # probe view: same VLP model/variables, downstream preprocessing statics
    probe_task = copy.copy(vlp_task)
    probe_task.statics = fold.statics

    def extract(variables):
        from vlp_tpu.train.step import collect_over_loader

        k = max(1, cfg.trainer.scan_steps)
        feats_tr, y_tr = collect_over_loader(
            probe_task.features_fn, variables, fold.train_loader, k, mesh,
            cfg.mesh.axis_name)
        xs, ys = [], []
        for loader in fold.val_loaders.values():
            f, y = collect_over_loader(probe_task.features_fn, variables,
                                       loader, k, mesh, cfg.mesh.axis_name)
            xs.append(f)
            ys.append(y)
        return feats_tr, y_tr, np.concatenate(xs), np.concatenate(ys)

    def embed_val(variables):
        from vlp_tpu.train.step import collect_over_loader

        k = max(1, cfg.trainer.scan_steps)
        xs, ys = [], []
        for loader in fold.val_loaders.values():
            e, y = collect_over_loader(probe_task.embed_images_fn, variables,
                                       loader, k, mesh, cfg.mesh.axis_name)
            xs.append(e)
            ys.append(y)
        return np.concatenate(xs), np.concatenate(ys)

    probe = LinearProbeCallback(extract, every_n_epochs=every_n)
    pak = DownstreamPrecisionAtK(embed_val, ks=cfg.model.retrieval_ks)
    return probe, pak, fold


def _ckpt_identity(path: str) -> list:
    """Cheap identity of a checkpoint DIRECTORY'S CONTENT: sorted
    (relpath, size, mtime_ns) of its files. A warm-start checkpoint
    regenerated at the same path must invalidate fold markers — the path
    string alone cannot distinguish old from new weights."""
    ident = []
    if path and os.path.isdir(path):
        for root, _, files in os.walk(path):
            for f in sorted(files):
                full = os.path.join(root, f)
                try:
                    st = os.stat(full)
                except OSError:
                    continue
                ident.append((os.path.relpath(full, path),
                              st.st_size, st.st_mtime_ns))
    ident.sort()
    return ident


def _config_fingerprint(cfg: Config) -> str:
    """Stable hash of every config field that affects a fold's training
    result. `resume_completed_folds` and `test` are excluded (they control
    orchestration around the folds, not the folds themselves); everything
    else — data scale, model, optimizer, pretrained_ckpt — is in, so a
    stale fold{i}.done.json written under different args is never reused
    (round-4 advisor finding: silently mixing scales in one resumed run).
    The warm-start checkpoint contributes its CONTENT identity (file
    sizes + mtimes), not just its path: a pretrain regenerated at the
    same path invalidates the folds trained against the old weights."""
    import hashlib

    d = cfg.to_dict()
    d.pop("resume_completed_folds", None)
    d.pop("test", None)
    d["__pretrained_ckpt_identity__"] = _ckpt_identity(
        getattr(cfg.model, "pretrained_ckpt", None))
    blob = json.dumps(d, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _write_fold_done(path: str, summary: Dict[str, float], fp: str) -> None:
    """Atomic completion marker: summary + config fingerprint. Written via
    temp-file + os.replace so a kill mid-write can never leave a truncated
    marker that a later resume would trust."""
    from vlp_tpu.utils.logging import _to_jsonable

    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"fingerprint": fp,
                   "summary": {k: _to_jsonable(v)
                               for k, v in summary.items()}}, fh, indent=2)
    os.replace(tmp, path)


def train(cfg: Config) -> Dict[str, float]:
    # pure config validation FIRST — before paying mesh/dataset setup
    if cfg.ckpt_path and cfg.k_fold_cross_validation:
        raise ValueError(
            "ckpt_path carries ONE fold's training state; under "
            "k_fold_cross_validation=true it would be loaded into every "
            "fold (same weights + skipped epoch range -> invalid CV "
            "statistics). Resume the interrupted fold with "
            "k_fold_cross_validation=false, or drop ckpt_path.")
    if cfg.mesh.model_parallel > 1 and cfg.mesh.infonce_impl == "shard_map":
        raise ValueError(
            "mesh.infonce_impl='shard_map' is written for a 1-D data mesh; "
            "with mesh.model_parallel>1 use infonce_impl='gspmd' (GSPMD "
            "partitions the contrastive matrix over both axes).")
    if cfg.mesh.param_sharding == "tp" and cfg.mesh.model_parallel <= 1:
        raise ValueError(
            "mesh.param_sharding='tp' shards weights over the model axis — "
            "set mesh.model_parallel>1 (2-D data x model mesh).")
    if cfg.mesh.param_sharding == "fsdp" and cfg.mesh.model_parallel > 1:
        raise ValueError(
            "mesh.param_sharding='fsdp' shards over the data axis and "
            "never uses the model axis — model_parallel>1 would leave the "
            "model-axis devices as pure replicas. Use param_sharding='tp' "
            "on a 2-D mesh, or fsdp with model_parallel=1.")
    os.makedirs(cfg.output_dir, exist_ok=True)
    mesh = create_mesh(cfg.mesh.data_parallel, cfg.mesh.axis_name,
                       model_parallel=cfg.mesh.model_parallel,
                       model_axis_name=cfg.mesh.model_axis_name)
    logger.info("Mesh: %s over %d devices", mesh.axis_names, mesh.size)
    dm = build_datamodule(cfg, mesh)
    is_vlp = cfg.model.task == "vision_language"

    downstream = None
    if is_vlp:
        import copy as _copy

        ds_cfg = Config(**{})
        # deep copy: train() must not mutate the caller's cfg (the synthetic
        # rewrite below would leak into logged configs / reused cfg objects)
        ds_cfg.data = _copy.deepcopy(cfg.downstream_data)
        ds_cfg.mesh = cfg.mesh
        ds_cfg.output_dir = cfg.output_dir
        if cfg.data.name.startswith("synthetic"):
            ds_cfg.data.name = "synthetic_downstream"
        downstream = DownstreamData(ds_cfg, mesh)

    fold_summaries: List[Dict[str, float]] = []
    n_folds = None if cfg.k_fold_cross_validation else 1
    fp = _config_fingerprint(cfg)
    for fold in dm.folds():
        if n_folds is not None and fold.index >= n_folds:
            break
        done_path = os.path.join(cfg.output_dir,
                                 f"fold{fold.index}.done.json")
        if cfg.resume_completed_folds and os.path.exists(done_path):
            try:
                with open(done_path) as fh:
                    done = json.load(fh)
            except (OSError, json.JSONDecodeError):
                done = None
            if done and done.get("fingerprint") == fp:
                logger.info("Fold %d: reusing completed summary (%s)",
                            fold.index, done_path)
                fold_summaries.append(done["summary"])
                continue
            if done is not None:
                logger.warning(
                    "Fold %d: %s fingerprint does not match this config "
                    "(args/data changed since it was written) — re-running "
                    "the fold", fold.index, done_path)
        sinks = [
            MemorySink(),
            JsonlSink(os.path.join(cfg.output_dir,
                                   f"metrics_fold{fold.index}.jsonl")),
        ]
        if cfg.logger == "wandb":
            try:
                from vlp_tpu.utils.logging import WandbSink

                sinks.append(WandbSink(
                    cfg.wandb_project,
                    name=f"{cfg.experiment or cfg.model.model}_fold{fold.index}",
                    group=cfg.experiment, tags=list(cfg.tags),
                    config=cfg.to_dict()))
            except Exception as e:
                logger.warning("wandb unavailable (%s); JSONL sink only", e)
        sink = MultiSink(sinks)
        statics = fold.statics
        task = build_task(cfg, statics)
        probe = pak = None
        if is_vlp and downstream is not None:
            probe, pak, _ = _linear_probe_callback(
                cfg, mesh, downstream,
                cfg.trainer.linear_probe_every_n_epochs, task)
        trainer = Trainer(
            cfg, task, fold.train_loader, fold.val_loaders, sink=sink,
            mesh=mesh,
            checkpoint_dir=os.path.join(cfg.output_dir, "checkpoints",
                                        f"fold{fold.index}"),
            linear_probe=probe, downstream_pak=pak,
            retrieval_ks=cfg.model.retrieval_ks)
        _maybe_warm_start(cfg, trainer)
        if is_vlp:
            _maybe_load_pretrained_text_tower(cfg, trainer)
        from vlp_tpu.utils.hparams import log_hyperparameters

        log_hyperparameters(cfg, trainer.state.params,
                            trainer.state.extra_vars, sink)
        if cfg.ckpt_path:
            # resume training from a saved state (reference passes ckpt_path
            # through to trainer.fit, src/train.py:171)
            if ckpt.load_meta(cfg.ckpt_path) is not None:
                trainer.load_resume_state(cfg.ckpt_path)
            else:
                tree = ckpt.restore(cfg.ckpt_path, {
                    "params": trainer.state.params,
                    "extra_vars": trainer.state.extra_vars})
                trainer.state = trainer.state.replace(
                    params=tree["params"], extra_vars=tree["extra_vars"])
                logger.warning(
                    "ckpt_path %s is a weights-only checkpoint: this is a "
                    "WARM START, not a resume — optimizer moments, LR "
                    "schedule position and epoch counters restart from zero "
                    "(full-state checkpoints carry a .meta.json sidecar)",
                    cfg.ckpt_path)
        trainer.fit()
        summary = dict(sink.sinks[0].summary)
        if not is_vlp:
            summary.update(_post_fit_plots(cfg, trainer, fold))
        if is_vlp and downstream is not None and trainer.checkpointer and \
                trainer.checkpointer.best_path:
            summary.update(_downstream_precision_at_k(
                cfg, trainer, downstream, mesh))
        sink.log_summary(summary)
        sink.finish()
        _write_fold_done(done_path, summary, fp)
        fold_summaries.append(summary)
        logger.info("Fold %d summary: %s", fold.index,
                    {k: round(v, 4) for k, v in summary.items()
                     if isinstance(v, float)})

    agg = aggregate_folds(fold_summaries)
    with open(os.path.join(cfg.output_dir, "cv_summary.json"), "w") as fh:
        json.dump(agg, fh, indent=2)
    logger.info("CV aggregate: %s", {k: round(v, 4) for k, v in agg.items()})
    if cfg.test and not is_vlp:
        agg.update(_evaluate_test_set(cfg, dm, mesh))
    return agg


def _evaluate_test_set(cfg: Config, dm, mesh) -> Dict[str, float]:
    """cfg.test=True: evaluate each fold's best checkpoint on the frozen
    test split and write the per-subgroup long CSV (the reference runs this
    via scripts/test_eval_downstream.py after training)."""
    import glob

    from vlp_tpu.eval.subgroup import evaluate_results
    from vlp_tpu.eval.test_eval import collect_probs

    ckpts = []  # (fold_index, best_ckpt_path) — index parsed from the
    # directory name so a fold without checkpoints (crash) cannot shift
    # later folds onto the wrong statistics; numeric sort (fold10 > fold2)
    for fold_dir in sorted(
            glob.glob(os.path.join(cfg.output_dir, "checkpoints", "fold*")),
            key=lambda p: int(os.path.basename(p)[4:])):
        # authoritative best path: the 'last' checkpoint's meta sidecar
        # records checkpoint_best_path for THIS run — a lexicographic pick
        # over epoch* dirs would silently grab stale checkpoints left by a
        # previous run sharing output_dir (or by a crash mid-save)
        best = None
        paths = [p for p in glob.glob(os.path.join(fold_dir, "epoch*"))
                 if os.path.isdir(p)]  # skip .meta.json sidecars
        meta = ckpt.load_meta(os.path.join(fold_dir, "last"))
        meta_path = os.path.join(fold_dir, "last.meta.json")
        # trust the sidecar only if NO epoch checkpoint postdates it —
        # a later run in the same output_dir (save_last off, or crashed
        # before its first 'last' save) would otherwise be shadowed by the
        # previous run's stale meta
        meta_fresh = meta is not None and os.path.exists(meta_path) and \
            all(os.path.getmtime(p) <= os.path.getmtime(meta_path) + 1.0
                for p in paths)
        if meta_fresh and meta.get("checkpoint_best_path") and \
                os.path.isdir(meta["checkpoint_best_path"]):
            best = meta["checkpoint_best_path"]
        elif paths:
            best = max(paths, key=os.path.getmtime)
            if len(paths) > 1 or meta is not None:
                logger.warning(
                    "test=True: %s meta sidecar is missing or stale "
                    "(%d epoch checkpoints on disk); using newest by "
                    "mtime: %s", fold_dir, len(paths), best)
        if best:
            ckpts.append((int(os.path.basename(fold_dir)[4:]), best))
        else:
            logger.warning("test=True: %s has no checkpoints; its fold is "
                           "skipped", fold_dir)
    if not ckpts:
        logger.warning("test=True but no checkpoints found; skipping")
        return {}
    dfs = [collect_probs(cfg, path, dm, fold, mesh)
           for fold, path in ckpts]
    out_csv = os.path.join(cfg.output_dir, "test_eval.csv")
    results = evaluate_results(out_csv, dfs)
    overall = results[(results.level == "overall")]
    agg = {f"test/{m}": float(overall[overall.metric == m]["value"].mean())
           for m in overall.metric.unique()}
    logger.info("Frozen test set: %s (full CSV: %s)",
                {k: round(v, 4) for k, v in agg.items()}, out_csv)
    return agg


def _post_fit_plots(cfg: Config, trainer: Trainer, fold) -> Dict[str, float]:
    """Per-fold t-SNE + silhouette + confusion matrix on the val loaders
    (reference src/train.py:180-183, :261-325)."""
    try:
        from vlp_tpu.eval.plotting import plot_confusion_matrix, plot_tsne_and_silhouette
        from vlp_tpu.train.step import collect_over_loader

        out: Dict[str, float] = {}
        plot_dir = os.path.join(cfg.output_dir, "plots", f"fold{fold.index}")
        # ONE forward pass per batch (features ++ logit column) through the
        # K-batch scanned collector — the earlier per-batch double-pass loop
        # paid 2 forwards and O(batches) dispatches
        feats, labels, datasets, probs = [], [], [], []
        for name, loader in fold.val_loaders.items():
            if len(loader) == 0:  # empty split: skip, keep other loaders
                continue
            fl, y = collect_over_loader(
                trainer.task.plot_outputs_fn, trainer.variables, loader,
                max(1, cfg.trainer.scan_steps), trainer.mesh,
                cfg.mesh.axis_name)
            fl = np.asarray(fl, np.float32)
            feats.append(fl[:, :-1])
            probs.append(1 / (1 + np.exp(-fl[:, -1])))
            labels.append(y)
            datasets.extend([name] * len(y))
        if not feats or not sum(len(f) for f in feats):
            return {}
        feats_np = np.concatenate(feats)
        labels_np = np.concatenate(labels)
        out.update(plot_tsne_and_silhouette(
            feats_np, labels_np, datasets,
            os.path.join(plot_dir, "tsne_val.png")))
        plot_confusion_matrix(np.concatenate(probs), labels_np,
                              os.path.join(plot_dir, "confusion_val.png"))
        return out
    except Exception as e:  # plotting must never kill a training run
        logger.warning("post-fit plotting failed: %s", e)
        return {}


def _downstream_precision_at_k(cfg: Config, trainer: Trainer,
                               downstream: DownstreamData, mesh
                               ) -> Dict[str, float]:
    """Zero-shot-style label precision@k of the best VLP image tower over
    the entire downstream train+val data (reference src/train.py:187-211,
    VisionLanguageModule.py:299-361)."""
    from vlp_tpu.ops.retrieval import label_precision_at_k
    from vlp_tpu.train.step import collect_over_loader

    import copy

    best = trainer.checkpointer.restore_best(
        {"params": trainer.state.params,
         "extra_vars": trainer.state.extra_vars})
    variables = {"params": best["params"], **best["extra_vars"]}
    fold = next(downstream.folds())
    # embed with the DOWNSTREAM fold's normalization statics (same view the
    # per-epoch probe/p@k callbacks use) — trainer.task carries the
    # PRETRAIN fold's mean/std, which would mis-normalize these images
    eval_task = copy.copy(trainer.task)
    eval_task.statics = fold.statics
    embs, labels = [], []
    loaders = [fold.train_loader] + list(fold.val_loaders.values())
    for loader in loaders:
        e, y = collect_over_loader(
            eval_task.embed_images_fn, variables, loader,
            max(1, cfg.trainer.scan_steps), mesh, cfg.mesh.axis_name)
        embs.append(e)
        labels.append(y)
    import jax.numpy as jnp

    emb = jnp.asarray(np.concatenate(embs))
    y = jnp.asarray(np.concatenate(labels))
    ks = tuple(k for k in cfg.model.retrieval_ks if k + 1 <= emb.shape[0])
    if not ks:  # tiny subsampled downstream sets: p@k undefined, don't crash
        return {}
    p = label_precision_at_k(emb, y, ks=ks)
    return {f"downstream_entire/label_precision_at_{k}": float(p[k])
            for k in ks}


def aggregate_folds(summaries: List[Dict[str, float]]) -> Dict[str, float]:
    """mean/std across folds (reference src/train.py:229-240)."""
    if not summaries:
        return {}
    keys = set.intersection(*(set(s) for s in summaries))
    out = {}
    for k in sorted(keys):
        vals = [float(s[k]) for s in summaries
                if isinstance(s[k], (int, float))]
        if not vals:
            continue
        out[f"{k}_mean"] = float(np.mean(vals))
        out[f"{k}_std"] = float(np.std(vals))
    out["num_folds"] = len(summaries)
    return out


def main(argv: Optional[List[str]] = None) -> int:
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    cfg = apply_overrides(Config(), argv)
    np.random.seed(cfg.seed)
    train(cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
