"""Per-subgroup metric evaluation -> long-format CSV.

Same output contract as the reference's offline eval
(scripts/test_eval_downstream.py:120-278): columns
[level, group, fold, metric, value]; levels overall/dataset/entity/
anatomy_site/sex/age_encoded/age_group (0-18 / 19-39 / 40+); metrics
accuracy, balanced_accuracy, roc_auc, precision, recall, f1_score with NaN
for single-class subgroups. Implemented with vectorized groupbys instead of
the reference's row-append loop.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from vlp_tpu.ops.metrics import auroc_exact

SUBGROUP_LEVELS = ("dataset", "entity", "anatomy_site", "sex",
                   "age_encoded", "age_group")


def age_group(age) -> str:
    """0-18 / 19-39 / 40+ (reference test_eval_downstream.py age_group)."""
    age = int(age)
    if age <= 18:
        return "0-18"
    if age <= 39:
        return "19-39"
    return "40+"


def calculate_metrics(y_true: np.ndarray, y_probs: np.ndarray) -> Dict[str, float]:
    y_true = np.asarray(y_true, float).ravel()
    y_probs = np.asarray(y_probs, float).ravel()
    y_pred = (y_probs >= 0.5).astype(int)
    tp = float(((y_pred == 1) & (y_true == 1)).sum())
    fp = float(((y_pred == 1) & (y_true == 0)).sum())
    tn = float(((y_pred == 0) & (y_true == 0)).sum())
    fn = float(((y_pred == 0) & (y_true == 1)).sum())
    total = max(tp + fp + tn + fn, 1.0)
    recall = tp / max(tp + fn, 1.0)
    specificity = tn / max(tn + fp, 1.0)
    precision = tp / max(tp + fp, 1.0)
    out = {
        "accuracy": (tp + tn) / total,
        "balanced_accuracy": (recall + specificity) / 2.0,
    }
    if len(set(y_true.tolist())) < 2:
        out.update({"roc_auc": float("nan"), "precision": float("nan"),
                    "recall": float("nan"), "f1_score": float("nan")})
    else:
        out.update({
            "roc_auc": auroc_exact(y_probs, y_true),
            "precision": precision,
            "recall": recall,
            "f1_score": 2 * precision * recall / max(precision + recall, 1e-12),
        })
    return out


def predictions_frame(probs: np.ndarray, samples: List[dict]) -> pd.DataFrame:
    """Build the per-sample prediction frame the evaluator consumes
    (reference collect_probs, test_eval_downstream.py:26-117)."""
    df = pd.DataFrame({
        "prob": np.asarray(probs, float),
        "tumor": [int(s["tumor"]) for s in samples],
        "dataset": [str(s["dataset"]) for s in samples],
        "entity": [str(s.get("entity", "undefined")) for s in samples],
        "anatomy_site": [str(s["anatomy_site"]) for s in samples],
        "sex": [str(s["sex"]) for s in samples],
        "age": [int(s["age"]) for s in samples],
        "age_encoded": [int(s["age_encoded"]) for s in samples],
        "image_path": [str(s["image_path"]) for s in samples],
    })
    df["age_group"] = df["age"].map(age_group)
    return df


def evaluate_results(output_file: Optional[str], dfs: List[pd.DataFrame]
                     ) -> pd.DataFrame:
    """Per-fold overall + per-subgroup metrics -> long CSV."""
    rows = []

    def emit(level, group, fold, y_true, y_probs):
        for metric, value in calculate_metrics(y_true, y_probs).items():
            rows.append({"level": level, "group": group, "fold": fold,
                         "metric": metric, "value": value})

    for fold, df in enumerate(dfs):
        required = {"tumor", "prob", "entity", "anatomy_site", "dataset",
                    "sex", "age", "age_encoded", "age_group"}
        missing = required - set(df.columns)
        if missing:
            raise ValueError(f"prediction frame missing columns {missing}")
        emit("overall", "overall", fold, df["tumor"], df["prob"])
        for level in SUBGROUP_LEVELS:
            for group, sub in df.groupby(level):
                emit(level, group, fold, sub["tumor"], sub["prob"])
    out = pd.DataFrame(rows, columns=["level", "group", "fold", "metric",
                                      "value"])
    if output_file:
        os.makedirs(os.path.dirname(os.path.abspath(output_file)),
                    exist_ok=True)
        # atomic write: downstream tooling (rehearse_matrix resume) treats
        # this file's existence as a completion marker — a kill mid-write
        # must not leave a truncated CSV that later resumes would trust
        tmp = output_file + ".tmp"
        out.to_csv(tmp, index=False, na_rep="NaN")
        os.replace(tmp, output_file)
    return out


def aggregate_across_folds(results: pd.DataFrame) -> pd.DataFrame:
    """mean/std per (level, group, metric) — the 4-fold CV aggregation used
    in the reference README results table."""
    g = results.groupby(["level", "group", "metric"])["value"]
    agg = g.agg(["mean", "std", "count"]).reset_index()
    return agg
