"""Results-table renderer: per-experiment eval outputs -> the README-style
Acc/Prec/Rec/AUROC markdown table (reference README.md:138-150, produced
there by notebooks/Evaluation/downstream.ipynb).

Input: a YAML spec listing table rows, each pointing at a finished run
directory (the driver's ``output_dir``) that contains ``test_eval.csv``
(frozen-test long CSV from vlp_tpu.eval.subgroup, one row per fold+metric)
or, as a fallback, ``cv_summary.json`` (validation metrics). Output: a
markdown table with per-section best-value bolding and up/down arrows vs
the section's first baseline row, plus a tidy CSV.

Spec example:
    title: Bone-tumor detection, frozen INTERNAL+BTXRD test set (4-fold CV)
    rows:
      - section: Imaging
        experiment: Scratch Baseline
        model: ResNet34
        run_dir: outputs/baseline_only_imaging_resnet34
      - section: Imaging
        experiment: VLP Finetune (ours)
        model: ResNet34
        run_dir: outputs/finetune_only_imaging_resnet34
"""
from __future__ import annotations

import json
import math
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import yaml

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)

# (display column, test_eval metric name, cv_summary metric suffix)
METRIC_COLUMNS: Tuple[Tuple[str, str, str], ...] = (
    ("Acc", "accuracy", "accuracy"),
    ("Prec", "precision", "precision"),
    ("Rec", "recall", "recall"),
    ("AUROC", "roc_auc", "auroc"),
)


def metrics_from_test_eval(csv_path: str) -> Dict[str, Tuple[float, float]]:
    """mean±std across folds of the overall frozen-test metrics."""
    df = pd.read_csv(csv_path)
    overall = df[df["level"] == "overall"]
    out: Dict[str, Tuple[float, float]] = {}
    for disp, metric, _ in METRIC_COLUMNS:
        vals = overall[overall["metric"] == metric]["value"].astype(float)
        vals = vals[~vals.isna()]
        if len(vals):
            out[disp] = (float(vals.mean()), float(vals.std(ddof=0)))
    return out


def metrics_from_cv_summary(json_path: str) -> Dict[str, Tuple[float, float]]:
    """Fallback: best-epoch val/combined metrics from cv_summary.json
    (keys '<monitor>_best_val/combined/<metric>_{mean,std}')."""
    with open(json_path) as fh:
        agg = json.load(fh)
    out: Dict[str, Tuple[float, float]] = {}
    for disp, _, suffix in METRIC_COLUMNS:
        means = [k for k in agg
                 if k.endswith(f"val/combined/{suffix}_mean")]
        if not means:
            continue
        k = sorted(means)[0]
        out[disp] = (float(agg[k]), float(agg.get(k[:-5] + "_std", 0.0)))
    return out


def collect_row_metrics(run_dir: str) -> Tuple[Dict[str, Tuple[float, float]], str]:
    """Returns ({column: (mean, std)}, source) preferring the frozen test
    CSV over validation summaries."""
    test_csv = os.path.join(run_dir, "test_eval.csv")
    if os.path.exists(test_csv):
        return metrics_from_test_eval(test_csv), "test"
    cv_json = os.path.join(run_dir, "cv_summary.json")
    if os.path.exists(cv_json):
        return metrics_from_cv_summary(cv_json), "val"
    raise FileNotFoundError(
        f"{run_dir} has neither test_eval.csv nor cv_summary.json")


def _fmt(mean: float, std: float, bold: bool, arrow: str) -> str:
    cell = f"{mean:.2f}±{std:.3f}"
    if bold:
        cell = f"**{cell}**"
    return f"{arrow}{cell}"


def render_markdown(spec: Dict) -> Tuple[str, pd.DataFrame]:
    rows: List[Dict] = []
    for row in spec["rows"]:
        metrics, source = collect_row_metrics(row["run_dir"])
        rows.append({**row, "metrics": metrics, "source": source})

    tidy = []
    lines = []
    if spec.get("title"):
        lines.append(f"### {spec['title']}")
        lines.append("")
    header = ["**Experiment**", "**Model**"] + [
        f"**{d}**" for d, _, _ in METRIC_COLUMNS]
    lines.append("| " + " | ".join(header) + " |")
    lines.append("|" + "---|" * len(header))

    sections: Dict[str, List[Dict]] = {}
    for r in rows:
        sections.setdefault(r.get("section", ""), []).append(r)

    for section, srows in sections.items():
        if section:
            lines.append(
                "| " + " | ".join([f"**{section}**", ""] +
                                  [""] * len(METRIC_COLUMNS)) + " |")
        # per-column best (bold) and baseline (arrows) within the section
        best: Dict[str, float] = {}
        for r in srows:
            for d, (m, _s) in r["metrics"].items():
                if not math.isnan(m):
                    best[d] = max(best.get(d, -np.inf), m)
        baseline = next(
            (r for r in srows
             if "scratch" in str(r.get("experiment", "")).lower()), None)
        for r in srows:
            cells = [str(r.get("experiment", "")), str(r.get("model", ""))]
            for d, _, _ in METRIC_COLUMNS:
                if d not in r["metrics"]:
                    cells.append("—")
                    continue
                m, s = r["metrics"][d]
                arrow = ""
                if baseline is not None and r is not baseline and \
                        d in baseline["metrics"]:
                    bm = baseline["metrics"][d][0]
                    arrow = "↑" if round(m, 2) > round(bm, 2) else (
                        "↓" if round(m, 2) < round(bm, 2) else "")
                cells.append(_fmt(m, s, bold=(round(m, 6) ==
                                              round(best.get(d, np.nan), 6)),
                                  arrow=arrow))
                tidy.append({"section": section,
                             "experiment": r.get("experiment"),
                             "model": r.get("model"), "metric": d,
                             "mean": m, "std": s, "source": r["source"]})
            lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines) + "\n", pd.DataFrame(tidy)


def main(argv: Optional[List[str]] = None) -> int:
    import argparse
    import sys

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("spec", help="YAML row spec (see module docstring)")
    parser.add_argument("--out", default="results_table.md")
    parser.add_argument("--csv", default=None,
                        help="also write the tidy CSV here")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    with open(args.spec) as fh:
        spec = yaml.safe_load(fh)
    md, tidy = render_markdown(spec)
    with open(args.out, "w") as fh:
        fh.write(md)
    if args.csv:
        tidy.to_csv(args.csv, index=False)
    print(md)
    logger.info("results table -> %s", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
