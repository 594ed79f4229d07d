"""Exploratory data analysis reports.

The reference keeps per-dataset EDA in notebooks (notebooks/: 5 EDA + 2
visualization ipynb). Script equivalent: distribution summaries (label
balance, anatomy sites, age/sex, caption duplication stats) + plots from a
manifest, runnable on real or synthetic data.

Usage: python -m vlp_tpu.eval.eda --out-dir outputs/eda [overrides]
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def dataset_report(samples: List[dict]) -> Dict:
    df = pd.DataFrame(samples)
    report: Dict = {"num_samples": len(df)}
    if "tumor" in df.columns:
        report["label_balance"] = df["tumor"].value_counts().to_dict()
    if "label" in df.columns:
        report["label_balance"] = df["label"].value_counts().to_dict()
    for col in ("dataset", "anatomy_site", "sex", "entity", "age_encoded"):
        if col in df.columns:
            report[f"{col}_counts"] = {
                str(k): int(v) for k, v in df[col].value_counts().items()}
    if "caption_id" in df.columns:
        dup = df["caption_id"].value_counts()
        report["caption_stats"] = {
            "unique_captions": int(dup.size),
            "max_samples_per_caption": int(dup.max()),
            "mean_samples_per_caption": float(dup.mean()),
        }
    return report


def plot_distributions(samples: List[dict], out_dir: str) -> List[str]:
    df = pd.DataFrame(samples)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    label_col = "tumor" if "tumor" in df.columns else "label"
    for col in ("anatomy_site", "sex", "age_encoded", "dataset"):
        if col not in df.columns:
            continue
        fig, ax = plt.subplots(figsize=(8, 4))
        pivot = df.groupby([col, label_col]).size().unstack(fill_value=0)
        pivot.plot.bar(ax=ax, stacked=True)
        ax.set_title(f"{col} distribution by {label_col}")
        path = os.path.join(out_dir, f"dist_{col}.png")
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written


def main(argv: Optional[List[str]] = None) -> int:
    import argparse
    import sys

    from vlp_tpu.config import Config, apply_overrides

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out-dir", default="outputs/eda")
    args, overrides = parser.parse_known_args(
        argv if argv is not None else sys.argv[1:])
    cfg = apply_overrides(Config(), overrides)
    if cfg.data.name in ("synthetic_downstream", "downstream"):
        from vlp_tpu.data.datamodule import DownstreamData

        dm = DownstreamData(cfg)
        groups = {"train_val": dm.train_val, "test": dm.test}
    else:
        from vlp_tpu.data.datamodule import PretrainData

        dm = PretrainData(cfg)
        groups = {"train_val": dm.train_val}
    os.makedirs(args.out_dir, exist_ok=True)
    for name, samples in groups.items():
        report = dataset_report(samples)
        with open(os.path.join(args.out_dir, f"report_{name}.json"), "w") as fh:
            json.dump(report, fh, indent=2)
        plots = plot_distributions(samples, os.path.join(args.out_dir, name))
        logger.info("%s: %d samples, %d plots, report written", name,
                    report["num_samples"], len(plots))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
