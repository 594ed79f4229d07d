"""The Trainer: epoch loop, validation, callbacks, checkpointing.

Functional replacement for Lightning's Trainer.fit over one CV fold
(reference src/train.py:171 + the LightningModule hook flow). Differences by
design: the training step is ONE jitted function with donated state; metrics
are streaming counter pytrees merged across validation loaders (the
reference caches raw predictions per dataloader and recomputes combined
metrics at epoch end — merged counters give the same numbers without
keeping per-sample caches); augmentation happens inside the step on device.

Metric naming mirrors the reference so monitors carry over:
  train/loss, val/internal/accuracy, val/btxrd/auroc,
  val/combined/accuracy, val/combined/loss, ...
Pretrain adds val/{lera,mura}/label_precision_at_k, .../recall_at_k, and
downstream_validation/linear_probe_* from the probe callback.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlp_tpu.config import Config
from vlp_tpu.data.pipeline import DeviceLoader
from vlp_tpu.models.tasks import BaseTask, VisionLanguageTask
from vlp_tpu.ops import metrics as M
from vlp_tpu.ops.retrieval import (
    image_text_recall_at_k,
    label_precision_at_k,
    masked_image_text_recall_at_k,
    masked_label_precision_at_k,
)
from vlp_tpu.train.callbacks import EarlyStopping, LinearProbeCallback, MetricSnapshot
from vlp_tpu.train.optim import make_optimizer
from vlp_tpu.train.state import TrainState
from vlp_tpu.train.step import (
    collect_over_loader,
    make_eval_step,
    make_scanned_apply_fn,
    make_scanned_metric_eval_step,
    make_scanned_train_step,
    make_train_step,
)
from vlp_tpu.utils.checkpoint import Checkpointer
from vlp_tpu.utils.logging import MemorySink, MetricSink, get_logger

logger = get_logger(__name__)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        task: BaseTask,
        train_loader: DeviceLoader,
        val_loaders: Dict[str, DeviceLoader],
        sink: Optional[MetricSink] = None,
        mesh=None,
        checkpoint_dir: Optional[str] = None,
        linear_probe: Optional[LinearProbeCallback] = None,
        downstream_pak=None,  # DownstreamPrecisionAtK
        retrieval_ks: Sequence[int] = (3, 5, 10, 15),
    ) -> None:
        self.cfg = cfg
        self.task = task
        self.train_loader = train_loader
        self.val_loaders = val_loaders
        self.sink = sink or MemorySink()
        self.mesh = mesh
        self.retrieval_ks = tuple(retrieval_ks)
        self.linear_probe = linear_probe
        self.downstream_pak = downstream_pak

        steps_per_epoch = max(len(train_loader), 1)
        # init from a sampler-free batch: iterating the loader here would
        # let the prefetch thread advance the shared sampler RNG a
        # timing-dependent number of batches, breaking fixed-seed
        # reproducibility
        init_batch = train_loader.init_batch()
        variables = task.init_variables(jax.random.key(cfg.seed), init_batch)
        extra = {k: v for k, v in variables.items() if k != "params"}
        self.tx = make_optimizer(cfg, variables["params"], steps_per_epoch)
        self.state = TrainState.create(variables["params"], extra, self.tx,
                                       jax.random.key(cfg.seed + 1))
        self.state_shardings = None
        if mesh is not None:
            from vlp_tpu.parallel.mesh import shard_train_state

            self.state, shardings = shard_train_state(
                self.state, mesh, cfg.mesh.param_sharding,
                cfg.mesh.axis_name, cfg.mesh.model_axis_name)
            if cfg.mesh.param_sharding in ("fsdp", "tp"):
                self.state_shardings = shardings
        self.train_step = make_train_step(task, self.tx, mesh,
                                          cfg.mesh.axis_name,
                                          self.state_shardings)
        # K-step scanned dispatch (one host->device round trip per K steps;
        # VERDICT r1 #4: the Trainer must train the way the benchmark
        # measures). VLP runs that cache embeddings for train-epoch
        # retrieval metrics ride the SAME scan: the embeddings come back
        # stacked [K, B, E] and stay on device until epoch end (the old
        # path forced per-step dispatch + a device_get per step).
        self.cache_train_emb = (isinstance(task, VisionLanguageTask)
                                and cfg.trainer.cache_train_embeddings)
        self.scan_k = int(cfg.trainer.scan_steps)
        self.use_scan = self.scan_k > 1
        self.scan_step = (
            make_scanned_train_step(
                task, self.tx, self.scan_k, mesh, cfg.mesh.axis_name,
                self.state_shardings,
                aux_keys=(("img_emb", "txt_emb") if self.cache_train_emb
                          else ()))
            if self.use_scan else None)
        self.eval_step = make_eval_step(task, mesh, cfg.mesh.axis_name)
        # K-batch scanned validation: dispatch count drops from O(batches)
        # to O(batches/K). Classifier metric state streams through the scan
        # carry (one fetch per loader); VLP embeddings come back stacked
        # per chunk.
        self.eval_scan_k = self.scan_k if self.scan_k > 1 else 0
        if self.eval_scan_k:
            if isinstance(task, VisionLanguageTask):
                self.scan_eval = make_scanned_apply_fn(
                    task.eval_fn, self.eval_scan_k, mesh, cfg.mesh.axis_name)
            else:
                self.scan_metric_eval = make_scanned_metric_eval_step(
                    task, self.eval_scan_k, mesh, cfg.mesh.axis_name)
        self.checkpointer = (
            Checkpointer(checkpoint_dir, cfg.trainer.checkpoint_monitor,
                         cfg.trainer.checkpoint_mode,
                         async_write=cfg.trainer.async_checkpointing)
            if checkpoint_dir else None)
        self._last_saver = None
        if cfg.trainer.save_last and checkpoint_dir:
            from vlp_tpu.utils.checkpoint import LastStateSaver

            self._last_saver = LastStateSaver(
                f"{checkpoint_dir}/last",
                async_write=cfg.trainer.async_checkpointing)
        self.early_stopping = (
            EarlyStopping(cfg.trainer.early_stopping_monitor,
                          cfg.trainer.early_stopping_mode,
                          cfg.trainer.early_stopping_patience,
                          cfg.trainer.min_epochs)
            if cfg.trainer.early_stopping_monitor else None)
        self.snapshot = MetricSnapshot(self.sink,
                                       cfg.trainer.checkpoint_monitor,
                                       cfg.trainer.checkpoint_mode)
        self.is_vlp = isinstance(task, VisionLanguageTask)
        self._step_times: List[float] = []
        self.start_epoch = 0
        self.checkpoint_dir = checkpoint_dir

    # ------------------------------------------------------------------
    @property
    def variables(self) -> Dict:
        return {"params": self.state.params, **self.state.extra_vars}

    # -- exact resume ----------------------------------------------------
    def _loop_meta(self, epoch: int) -> Dict:
        """Host-side loop counters for the checkpoint meta sidecar."""
        meta: Dict = {"epoch": int(epoch)}
        if self.early_stopping:
            meta["early_stopping"] = {
                "best": self.early_stopping.best,
                "wait": self.early_stopping.wait,
                "should_stop": self.early_stopping.should_stop,
            }
        meta["snapshot_best"] = self.snapshot.best
        meta["snapshot_metrics"] = self.snapshot.snapshot
        if self.checkpointer:
            meta["checkpoint_best"] = self.checkpointer.best
            meta["checkpoint_best_path"] = self.checkpointer.best_path
        sampler = getattr(self.train_loader, "sampler", None)
        if sampler is not None and hasattr(sampler, "rng_state"):
            meta["sampler_rng"] = sampler.rng_state()
        return meta

    def load_resume_state(self, path: str) -> None:
        """Restore a FULL-state checkpoint: params, BN stats, optimizer
        moments, step, device RNG, loop counters, and the train sampler's
        host RNG — training continues exactly where it stopped (Lightning
        ckpt_path resume semantics, reference src/train.py:171)."""
        from vlp_tpu.utils import checkpoint as _ckpt

        meta = _ckpt.load_meta(path)
        if meta is None:
            raise ValueError(
                f"{path} is a weights-only checkpoint (no .meta.json); "
                "use the warm-start path instead")
        self.state = _ckpt.restore_train_state(path, self.state)
        self.start_epoch = int(meta["epoch"]) + 1
        if self.early_stopping and meta.get("early_stopping"):
            es = meta["early_stopping"]
            self.early_stopping.best = es["best"]
            self.early_stopping.wait = int(es["wait"])
            self.early_stopping.should_stop = bool(es["should_stop"])
        self.snapshot.restore(meta.get("snapshot_best"),
                              meta.get("snapshot_metrics"))
        if self.checkpointer and meta.get("checkpoint_best") is not None:
            self.checkpointer.best = meta["checkpoint_best"]
            self.checkpointer.best_path = meta.get("checkpoint_best_path")
        sampler = getattr(self.train_loader, "sampler", None)
        if sampler is not None and meta.get("sampler_rng") is not None \
                and hasattr(sampler, "set_rng_state"):
            sampler.set_rng_state(meta["sampler_rng"])
        logger.info("Resumed full training state from %s (next epoch %d)",
                    path, self.start_epoch)

    def fit(self, max_epochs: Optional[int] = None) -> Dict[str, float]:
        """``max_epochs`` overrides the loop bound only (the LR schedule
        keeps cfg.trainer.max_epochs) — lets callers stop early and later
        resume on the SAME schedule."""
        cfg = self.cfg
        last_metrics: Dict[str, float] = {}
        end_epoch = cfg.trainer.max_epochs if max_epochs is None else max_epochs
        # A monitor absent from the metrics dict makes Checkpointer and
        # MetricSnapshot silent no-ops — a misconfigured monitor would
        # otherwise yield a full run with no best checkpoint and no
        # harvested metrics, with zero warnings (Lightning raises here).
        # Interval metrics (the linear probe) appear at multiples of
        # probe_every, so give the monitor that long before failing.
        monitor = cfg.trainer.checkpoint_monitor
        monitor_seen = self.snapshot.best is not None  # resumed runs
        monitor_grace = max(1, cfg.trainer.linear_probe_every_n_epochs)
        for epoch in range(self.start_epoch, end_epoch):
            t0 = time.perf_counter()
            train_loss, images_seen = self._train_epoch(epoch)
            dt = time.perf_counter() - t0
            if train_loss != train_loss:  # NaN guard (failure detection):
                # fail fast with a clear error instead of training on garbage;
                # the best checkpoint (if any) remains on disk for resume.
                raise FloatingPointError(
                    f"training loss became NaN at epoch {epoch}; "
                    f"best checkpoint: "
                    f"{self.checkpointer.best_path if self.checkpointer else None}")
            metrics = {"train/loss": train_loss, "epoch": epoch,
                       "train/images_per_sec": images_seen / max(dt, 1e-9)}
            metrics.update(self._validate(epoch))
            if monitor in metrics:
                monitor_seen = True
            elif not monitor_seen:
                if epoch == self.start_epoch:
                    logger.warning(
                        "checkpoint monitor %r not in epoch metrics "
                        "(available: %s) — best-checkpoint/snapshot "
                        "tracking is idle until it appears", monitor,
                        sorted(metrics))
                if epoch >= self.start_epoch + monitor_grace:
                    self._missing_monitor(monitor, epoch - self.start_epoch
                                          + 1, metrics)
            self.sink.log(metrics, step=int(jax.device_get(self.state.step)))
            self.snapshot.on_validation_end(epoch, metrics)
            if self.early_stopping:
                self.early_stopping.on_validation_end(epoch, metrics)
            if self.checkpointer:
                from vlp_tpu.utils.checkpoint import state_to_tree

                self.checkpointer.maybe_save(
                    metrics, state_to_tree(self.state), epoch,
                    meta=self._loop_meta(epoch))
            if self._last_saver is not None:
                self._last_saver.save(self.state, meta=self._loop_meta(epoch))
            last_metrics = metrics
            if self.early_stopping and self.early_stopping.should_stop:
                break
        # Commit barrier: async checkpoint writes must be durable before
        # fit() returns (the driver reads best/'last' right after).
        if self.checkpointer:
            self.checkpointer.wait()
        if self._last_saver is not None:
            self._last_saver.wait()
        if not monitor_seen and last_metrics:
            # runs shorter than the grace window still fail loudly on a
            # typo'd monitor instead of completing with zero checkpoints
            self._missing_monitor(monitor, end_epoch - self.start_epoch,
                                  last_metrics)
        return last_metrics

    def _missing_monitor(self, monitor: str, n_epochs: int,
                         metrics: Dict[str, float]):
        """The configured checkpoint monitor never appeared. Raise —
        UNLESS a linear probe is attached and its last probe epoch
        legitimately skipped (single-class downstream data): the monitor
        config is then correct and the run continues with a warning."""
        if self.linear_probe is not None and \
                getattr(self.linear_probe, "skipped_last", False):
            logger.warning(
                "checkpoint monitor %r absent after %d epoch(s), but the "
                "linear probe skipped (single-class downstream data) — "
                "continuing with best-checkpoint tracking idle",
                monitor, n_epochs)
            return
        raise ValueError(
            f"checkpoint monitor {monitor!r} never appeared in {n_epochs} "
            f"epoch(s) of metrics (available: {sorted(metrics)}); fix "
            "trainer.checkpoint_monitor for this task")

    # ------------------------------------------------------------------
    def _train_epoch(self, epoch: int) -> Tuple[float, int]:
        from vlp_tpu.utils.profiling import StepTimer, trace

        import contextlib

        losses = []
        mask_sums = []
        timer = StepTimer(warmup=1)
        # train-epoch retrieval cache (reference
        # VisionLanguageModule.py:556-636): DEVICE arrays + pad masks,
        # consumed by the masked top-k metrics at epoch end — no per-step
        # host transfer in either dispatch mode.
        self._train_cache = {"img": [], "txt": [], "label": [], "mask": []}

        def cache_emb(img, txt, label, mask):
            flat = lambda x: x.reshape((-1,) + x.shape[2:]) \
                if x.ndim > 2 else x
            self._train_cache["img"].append(flat(img))
            self._train_cache["txt"].append(flat(txt))
            self._train_cache["label"].append(label.reshape(-1))
            self._train_cache["mask"].append(mask.reshape(-1))

        profile_ctx = None
        if self.cfg.trainer.profile and epoch == 0:
            profile_dir = self.cfg.trainer.profile_dir or \
                f"{self.cfg.output_dir}/profile"
            profile_ctx = trace(profile_dir)
        with (profile_ctx or contextlib.nullcontext()):
            if self.use_scan:
                # K steps per dispatch (lax.scan); ragged tail batches reuse
                # the per-step program.
                for kind, payload in self.train_loader.iter_scan_chunks(
                        self.scan_k):
                    timer.start()
                    if kind == "chunk":
                        self.state, aux = self.scan_step(self.state, payload)
                    else:
                        self.state, aux = self.train_step(self.state, payload)
                        aux = {**aux, "images": jnp.sum(aux["mask"])}
                    timer.stop()
                    losses.append(jnp.atleast_1d(aux["loss"]))
                    mask_sums.append(jnp.sum(aux["images"]))
                    if self.cache_train_emb:
                        cache_emb(aux["img_emb"], aux["txt_emb"],
                                  payload["label"], payload["mask"])
            else:
                for batch in self.train_loader:
                    timer.start()
                    self.state, aux = self.train_step(self.state, batch)
                    # async dispatch: only the epoch tail blocks; the timer's
                    # per-step stop is advisory (pipelined) — epoch wall time
                    # is the authoritative throughput number.
                    timer.stop()
                    losses.append(jnp.atleast_1d(aux["loss"]))
                    # real samples only — padded tail entries carry mask 0
                    # (device-side sum; fetched once at epoch end)
                    mask_sums.append(jnp.sum(aux["mask"]))
                    if self.cache_train_emb:
                        cache_emb(aux["img_emb"], aux["txt_emb"],
                                  batch["label"], aux["mask"])
        mean_loss = float(np.mean(jax.device_get(
            jnp.concatenate(losses)))) if losses else float("nan")
        images = int(np.sum(jax.device_get(jnp.stack(mask_sums)))) \
            if mask_sums else 0
        self._step_times.extend(timer._times)
        return mean_loss, images

    def _train_retrieval_metrics(self) -> Dict[str, float]:
        """Epoch-level retrieval metrics over the cached TRAIN embeddings
        (reference computes these per train epoch, :685-700). The cache
        holds padded DEVICE buffers; the masked top-k runs on device and
        only the scalar metrics (plus the valid-row count) reach the
        host."""
        cache = getattr(self, "_train_cache", None)
        if not cache or not cache["img"]:
            return {}
        img = jnp.concatenate(cache["img"])
        txt = jnp.concatenate(cache["txt"])
        labels = jnp.concatenate(cache["label"])
        mask = jnp.concatenate(cache["mask"])
        out: Dict[str, float] = {}
        n_valid = int(jax.device_get(jnp.sum(mask > 0)))
        ks = tuple(k for k in self.retrieval_ks if k + 1 <= n_valid)
        if ks:
            p = masked_label_precision_at_k(img, labels, mask, ks=ks)
            r = masked_image_text_recall_at_k(img, txt, mask, ks=ks)
            scalars = jax.device_get((p, r))
            for k in ks:
                out[f"train/label_precision_at_{k}"] = float(scalars[0][k])
                out[f"train/recall_at_{k}"] = float(scalars[1][k])
        self._train_cache = {"img": [], "txt": [], "label": [], "mask": []}
        return out

    # ------------------------------------------------------------------
    def _validate(self, epoch: int) -> Dict[str, float]:
        out: Dict[str, float] = {}
        if self.linear_probe is not None:
            out.update(self.linear_probe.on_validation_start(
                epoch, self.variables))
        if self.is_vlp:
            out.update(self._train_retrieval_metrics())
            out.update(self._validate_vlp())
            if self.downstream_pak is not None:
                out.update(self.downstream_pak.on_validation_end(
                    epoch, self.variables))
        else:
            out.update(self._validate_classifier())
        return out

    def _validate_classifier(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        combined = M.init_state()
        for name, loader in self.val_loaders.items():
            st = M.init_state()
            if self.eval_scan_k:
                for kind, payload in loader.iter_scan_chunks(
                        self.eval_scan_k):
                    if kind == "chunk":
                        st = self.scan_metric_eval(self.variables, st,
                                                   payload)
                    else:
                        o = self.eval_step(self.variables, payload)
                        st = M.update_state(st, o["logits"], o["labels"],
                                            o["mask"], o["loss"])
            else:
                for batch in loader:
                    o = self.eval_step(self.variables, batch)
                    st = M.update_state(st, o["logits"], o["labels"],
                                        o["mask"], o["loss"])
            combined = M.merge_states(combined, st)
            for k, v in M.compute_metrics(st, prefix=f"val/{name}/").items():
                out[k] = float(jax.device_get(v))
        for k, v in M.compute_metrics(combined, prefix="val/combined/").items():
            out[k] = float(jax.device_get(v))
        return out

    def _validate_vlp(self) -> Dict[str, float]:
        """Per-loader InfoNCE loss + epoch-level retrieval metrics over the
        full-epoch embeddings (reference VisionLanguageModule.py:556-636,
        :664-706). Embeddings stay ON DEVICE for the whole epoch: chunk
        outputs are accumulated as padded device buffers ([N_pad, E] with
        the pad mask) and the top-k metrics run mask-aware on device —
        the only host transfers are the final scalar metrics (the old path
        device_get -> host-concat -> re-upload'ed every chunk, O(val set)
        traffic per epoch over a ~174 ms/dispatch remote-PJRT tunnel)."""
        out: Dict[str, float] = {}
        for name, loader in self.val_loaders.items():
            img_chunks, txt_chunks, label_chunks = [], [], []
            mask_chunks, losses = [], []
            for o, batch, chunked in self._eval_outputs(loader):
                flat = (lambda x: x.reshape((-1,) + x.shape[2:])) if chunked \
                    else (lambda x: x)
                img_chunks.append(flat(o["img_emb"]))
                txt_chunks.append(flat(o["txt_emb"]))
                mask_chunks.append(o["mask"].reshape(-1))
                label_chunks.append(batch["label"].reshape(-1))
                losses.append(jnp.atleast_1d(o["loss"]))
            if not img_chunks:
                continue  # empty val loader: skip, don't crash
            img = jnp.concatenate(img_chunks)
            txt = jnp.concatenate(txt_chunks)
            labels = jnp.concatenate(label_chunks)
            mask = jnp.concatenate(mask_chunks)
            # one scalar fetch per loader per epoch: the valid-row count
            # picks which ks are computable (k+1 <= n_valid, same contract
            # as the unmasked asserts)
            n_valid = int(jax.device_get(jnp.sum(mask > 0)))
            out[f"val/{name}/loss"] = float(jax.device_get(
                jnp.mean(jnp.concatenate(losses))))
            ks = tuple(k for k in self.retrieval_ks if k + 1 <= n_valid)
            if ks:
                p = masked_label_precision_at_k(img, labels, mask, ks=ks)
                r = masked_image_text_recall_at_k(img, txt, mask, ks=ks)
                scalars = jax.device_get((p, r))  # one fetch for all ks
                for k in ks:
                    out[f"val/{name}/label_precision_at_{k}"] = \
                        float(scalars[0][k])
                    out[f"val/{name}/recall_at_{k}"] = float(scalars[1][k])
        if all(f"val/{n}/loss" in out for n in self.val_loaders):
            out["val/combined/loss"] = float(np.mean(
                [out[f"val/{n}/loss"] for n in self.val_loaders]))
        return out

    def _eval_outputs(self, loader):
        """Yield (eval output, source payload, chunked?) triples using
        K-batch scan dispatches when enabled."""
        if self.eval_scan_k and isinstance(self.task, VisionLanguageTask):
            for kind, payload in loader.iter_scan_chunks(self.eval_scan_k):
                if kind == "chunk":
                    yield self.scan_eval(self.variables, payload),                         payload, True
                else:
                    yield self.eval_step(self.variables, payload),                         payload, False
        else:
            for batch in loader:
                yield self.eval_step(self.variables, batch), batch, False

    # ------------------------------------------------------------------
    def extract_features(self, loader: DeviceLoader) -> Tuple[np.ndarray, np.ndarray]:
        """Frozen-model pooled features + labels over a loader (linear probe
        / t-SNE / transfer eval); K-batch scan dispatches."""
        return collect_over_loader(
            self.task.features_fn, self.variables, loader,
            self.eval_scan_k or 1, self.mesh, self.cfg.mesh.axis_name)
