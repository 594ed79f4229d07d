"""t-SNE + silhouette + confusion-matrix plotting.

Reference src/utils/plotting/plot_tsne_and_calculate_silhouette.py:15-130
and plot_confusion_matrix.py:14-93: extract pooled features over loaders,
2-D TSNE (seed 42, perplexity <= 30), silhouette scores by tumor label and
by source dataset, seaborn scatter; confusion matrix = sigmoid -> 0.5
threshold -> normalized heatmap. Figures are saved to files (the reference
pushes them to wandb; the JSONL sink records the paths).
"""
from __future__ import annotations

import os
from typing import Dict, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def plot_tsne_and_silhouette(
    features: np.ndarray,
    tumor_labels: np.ndarray,
    dataset_labels: Sequence[str],
    out_path: str,
    seed: int = 42,
    title: str = "t-SNE of features",
) -> Dict[str, float]:
    """Returns silhouette scores by tumor label and dataset label; writes a
    two-panel scatter figure."""
    from sklearn.manifold import TSNE
    from sklearn.metrics import silhouette_score

    features = np.asarray(features)
    if features.ndim > 2:  # mean-pool spatial dims (reference :25-30)
        features = features.reshape(features.shape[0], -1)
    perplexity = min(30, max(2, len(features) // 4))
    emb = TSNE(n_components=2, random_state=seed,
               perplexity=perplexity).fit_transform(features)
    scores: Dict[str, float] = {}
    for name, labels in (("tumor", np.asarray(tumor_labels)),
                         ("dataset", np.asarray(dataset_labels))):
        if len(set(labels.tolist())) > 1:
            scores[f"silhouette_{name}"] = float(
                silhouette_score(features, labels))
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    for ax, labels, name in ((axes[0], np.asarray(tumor_labels), "tumor"),
                             (axes[1], np.asarray(dataset_labels), "dataset")):
        for v in sorted(set(labels.tolist())):
            m = labels == v
            ax.scatter(emb[m, 0], emb[m, 1], s=8, alpha=0.7, label=str(v))
        ax.set_title(f"{title} by {name}")
        ax.legend()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    logger.info("Saved t-SNE plot to %s (%s)", out_path, scores)
    return scores


def plot_confusion_matrix(
    probs: np.ndarray,
    labels: np.ndarray,
    out_path: str,
    threshold: float = 0.5,
    normalize: bool = True,
) -> np.ndarray:
    """Sigmoid-prob -> threshold -> 2x2 confusion heatmap (reference
    plot_confusion_matrix.py:14-62)."""
    probs = np.asarray(probs).ravel()
    labels = np.asarray(labels).ravel().astype(int)
    preds = (probs >= threshold).astype(int)
    cm = np.zeros((2, 2), float)
    for t, p in zip(labels, preds):
        cm[t, p] += 1
    plot = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1) if normalize else cm
    fig, ax = plt.subplots(figsize=(4, 4))
    im = ax.imshow(plot, cmap="Blues", vmin=0, vmax=plot.max() or 1)
    for i in range(2):
        for j in range(2):
            ax.text(j, i, f"{plot[i, j]:.2f}", ha="center", va="center")
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    ax.set_xticks([0, 1], ["no tumor", "tumor"])
    ax.set_yticks([0, 1], ["no tumor", "tumor"])
    fig.colorbar(im)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return cm
