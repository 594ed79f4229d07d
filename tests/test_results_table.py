"""Results-table renderer: long-CSV/cv-summary inputs -> the README-style
Acc/Prec/Rec/AUROC markdown table (reference README.md:138-150)."""
import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml

from vlp_tpu.eval.results_table import (
    collect_row_metrics,
    main,
    metrics_from_test_eval,
    render_markdown,
)


def _write_test_eval(run_dir, base=0.7, folds=4):
    os.makedirs(run_dir, exist_ok=True)
    rows = []
    rng = np.random.default_rng(0)
    for fold in range(folds):
        for metric, val in (("accuracy", base), ("precision", base + 0.02),
                            ("recall", base - 0.05), ("roc_auc", base + 0.1),
                            ("f1_score", base)):
            rows.append({"level": "overall", "group": "overall",
                         "fold": fold, "metric": metric,
                         "value": val + rng.normal(0, 0.01)})
        # subgroup rows must be ignored by the table
        rows.append({"level": "dataset", "group": "INTERNAL", "fold": fold,
                     "metric": "accuracy", "value": 0.1})
    pd.DataFrame(rows).to_csv(os.path.join(run_dir, "test_eval.csv"),
                              index=False)


def _write_cv_summary(run_dir, auroc=0.9):
    os.makedirs(run_dir, exist_ok=True)
    agg = {
        "val/combined/accuracy_best_val/combined/accuracy_mean": 0.8,
        "val/combined/accuracy_best_val/combined/accuracy_std": 0.01,
        "val/combined/accuracy_best_val/combined/auroc_mean": auroc,
        "val/combined/accuracy_best_val/combined/auroc_std": 0.02,
        "val/combined/accuracy_best_val/combined/precision_mean": 0.82,
        "val/combined/accuracy_best_val/combined/precision_std": 0.0,
        "val/combined/accuracy_best_val/combined/recall_mean": 0.78,
        "val/combined/accuracy_best_val/combined/recall_std": 0.0,
    }
    with open(os.path.join(run_dir, "cv_summary.json"), "w") as fh:
        json.dump(agg, fh)


def test_mean_std_across_folds(tmp_path):
    _write_test_eval(tmp_path / "run")
    m = metrics_from_test_eval(str(tmp_path / "run" / "test_eval.csv"))
    assert set(m) == {"Acc", "Prec", "Rec", "AUROC"}
    mean, std = m["Acc"]
    assert mean == pytest.approx(0.7, abs=0.02)
    assert 0 < std < 0.05


def test_prefers_frozen_test_over_val(tmp_path):
    _write_test_eval(tmp_path / "r")
    _write_cv_summary(tmp_path / "r")
    _, source = collect_row_metrics(str(tmp_path / "r"))
    assert source == "test"


def test_markdown_sections_arrows_and_bold(tmp_path):
    _write_test_eval(tmp_path / "scratch", base=0.65)
    _write_test_eval(tmp_path / "finetune", base=0.75)
    _write_cv_summary(tmp_path / "clinical")
    spec = {
        "title": "Synthetic smoke",
        "rows": [
            {"section": "Imaging", "experiment": "Scratch Baseline",
             "model": "ResNet34", "run_dir": str(tmp_path / "scratch")},
            {"section": "Imaging", "experiment": "VLP Finetune (ours)",
             "model": "ResNet34", "run_dir": str(tmp_path / "finetune")},
            {"section": "Imaging+Clinical", "experiment": "Scratch Baseline",
             "model": "ResNet34", "run_dir": str(tmp_path / "clinical")},
        ],
    }
    md, tidy = render_markdown(spec)
    assert "| **Experiment** | **Model** |" in md
    assert "| **Imaging** |" in md
    assert "| **Imaging+Clinical** |" in md
    # finetune beats scratch -> up arrow + bold best
    finetune_line = next(l for l in md.splitlines() if "Finetune" in l)
    assert "↑**" in finetune_line
    assert len(tidy) == 12  # 3 rows x 4 metrics
    assert (tidy[tidy.experiment == "VLP Finetune (ours)"]["source"]
            == "test").all()


def test_cli_roundtrip(tmp_path):
    _write_test_eval(tmp_path / "a", base=0.7)
    spec = {"rows": [{"section": "Imaging", "experiment": "Scratch Baseline",
                      "model": "ResNet34", "run_dir": str(tmp_path / "a")}]}
    spec_path = tmp_path / "spec.yaml"
    with open(spec_path, "w") as fh:
        yaml.safe_dump(spec, fh)
    out = tmp_path / "table.md"
    csv = tmp_path / "table.csv"
    assert main([str(spec_path), "--out", str(out), "--csv", str(csv)]) == 0
    assert "ResNet34" in open(out).read()
    assert len(pd.read_csv(csv)) == 4
