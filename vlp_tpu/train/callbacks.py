"""Trainer callbacks: early stopping, best-metric snapshot, linear probe.

Reference equivalents:
- EarlyStopping bundles (configs/callbacks/early_stopping_*.yaml,
  patience 35/15/26).
- SnapshotAllMetricsOnBestCallback (src/utils/MetricSnapshotCallback.py:10):
  when the monitored metric improves, copy EVERY current metric into the run
  summary under "{monitor}_best_{metric}" — this is how the k-fold driver
  harvests per-fold metrics-at-best-epoch (src/train.py:173-177).
- LinearProbeCallback (src/utils/LinearProbeCallback.py:17): every 5th
  epoch, extract frozen image-tower features for the downstream train/val
  sets and fit a logistic-regression probe; logs balanced accuracy + AUROC
  so checkpointing/early stopping can monitor them.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from vlp_tpu.utils.logging import MetricSink, get_logger

logger = get_logger(__name__)


class EarlyStopping:
    def __init__(self, monitor: str, mode: str = "max", patience: int = 35,
                 min_epochs: int = 1) -> None:
        self.monitor = monitor
        self.mode = mode
        self.patience = patience
        self.min_epochs = min_epochs
        self.best: Optional[float] = None
        self.wait = 0
        self.should_stop = False

    def on_validation_end(self, epoch: int, metrics: Dict[str, float]) -> None:
        if self.monitor not in metrics:
            return
        value = float(metrics[self.monitor])
        improved = (self.best is None
                    or (value > self.best if self.mode == "max" else value < self.best))
        if improved:
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience and epoch + 1 >= self.min_epochs:
                self.should_stop = True
                logger.info("EarlyStopping: stop at epoch %d (%s plateaued "
                            "for %d epochs)", epoch, self.monitor, self.wait)


class MetricSnapshot:
    """Copies all current metrics into the sink's summary on improvement."""

    def __init__(self, sink: MetricSink, monitor: str, mode: str = "max") -> None:
        self.sink = sink
        self.monitor = monitor
        self.mode = mode
        self.best: Optional[float] = None
        # the best-epoch snapshot itself rides in the checkpoint meta: a
        # resumed process starts with an EMPTY sink summary, and if the
        # monitor never improves again the harvested per-fold metrics
        # would silently vanish (restore() re-logs it)
        self.snapshot: Optional[Dict[str, float]] = None

    def on_validation_end(self, epoch: int, metrics: Dict[str, float]) -> None:
        if self.monitor not in metrics:
            return
        value = float(metrics[self.monitor])
        if (self.best is not None
                and not (value > self.best if self.mode == "max" else value < self.best)):
            return
        self.best = value
        snapshot = {
            f"{self.monitor}_best_{name}": v for name, v in metrics.items()
        }
        snapshot[f"{self.monitor}_best_epoch"] = epoch
        self.snapshot = snapshot
        self.sink.log_summary(snapshot)

    def restore(self, best: Optional[float],
                snapshot: Optional[Dict[str, float]]) -> None:
        """Resume path: restore the best value AND the harvested snapshot,
        re-logging it so the new process's sink summary carries the prior
        run's best-epoch metrics even if no further improvement occurs."""
        self.best = best
        if snapshot:
            self.snapshot = dict(snapshot)
            self.sink.log_summary(self.snapshot)


class DownstreamPrecisionAtK:
    """Zero-shot-style label precision@k of the VLP image tower over the
    downstream VALIDATION data, computed at every validation epoch end
    (reference VisionLanguageModule.py:702-705 calling
    evaluate_downstream_precision_at_k('validation')).

    ``embed(variables) -> (embeddings [N,E], labels [N])`` is supplied by the
    driver (it owns the downstream loaders + the jitted embedding pass)."""

    def __init__(self, embed: Callable, ks=(3, 5, 10, 15),
                 every_n_epochs: int = 1) -> None:
        self.embed = embed
        self.ks = tuple(ks)
        self.every_n_epochs = max(1, every_n_epochs)

    def on_validation_end(self, epoch: int, variables) -> Dict[str, float]:
        if epoch % self.every_n_epochs != 0:
            return {}
        import jax.numpy as jnp

        from vlp_tpu.ops.retrieval import label_precision_at_k

        emb, labels = self.embed(variables)
        emb = jnp.asarray(emb)
        labels = jnp.asarray(labels)
        ks = tuple(k for k in self.ks if k + 1 <= emb.shape[0])
        if not ks:
            return {}
        p = label_precision_at_k(emb, labels, ks=ks)
        return {f"downstream_validation/label_precision_at_{k}": float(p[k])
                for k in ks}


class LinearProbeCallback:
    """Fits a logistic-regression probe on frozen image features every N
    validation epochs. ``extract_features(variables) -> (X_train, y_train,
    X_val, y_val)`` is supplied by the trainer (it owns the downstream
    loaders and the jitted feature pass)."""

    def __init__(self, extract_features: Callable, every_n_epochs: int = 5,
                 max_iter: int = 1000) -> None:
        self.extract_features = extract_features
        self.every_n_epochs = max(1, every_n_epochs)
        self.max_iter = max_iter
        # True when the last PROBE epoch skipped (single-class data): the
        # trainer's missing-monitor check consults this so a legitimately
        # absent probe metric downgrades the failure to a warning
        self.skipped_last = False

    def on_validation_start(self, epoch: int, variables) -> Dict[str, float]:
        if epoch % self.every_n_epochs != 0:
            return {}
        from sklearn.linear_model import LogisticRegression
        from sklearn.metrics import balanced_accuracy_score, roc_auc_score

        x_tr, y_tr, x_va, y_va = self.extract_features(variables)
        if len(np.unique(y_tr)) < 2 or len(np.unique(y_va)) < 2:
            # tiny subsampled/synthetic folds can be single-class; a probe
            # is undefined there — skip instead of killing the run
            self.skipped_last = True
            logger.warning(
                "LinearProbe epoch %d skipped: single-class data "
                "(train classes %s, val classes %s)", epoch,
                np.unique(y_tr), np.unique(y_va))
            return {}
        self.skipped_last = False
        clf = LogisticRegression(max_iter=self.max_iter)
        clf.fit(np.asarray(x_tr), np.asarray(y_tr))
        probs = clf.predict_proba(np.asarray(x_va))[:, 1]
        preds = (probs >= 0.5).astype(int)
        metrics = {
            "downstream_validation/linear_probe_balanced_accuracy":
                float(balanced_accuracy_score(y_va, preds)),
            "downstream_validation/linear_probe_auroc":
                float(roc_auc_score(y_va, probs)),
        }
        logger.info("LinearProbe epoch %d: %s", epoch, metrics)
        return metrics
