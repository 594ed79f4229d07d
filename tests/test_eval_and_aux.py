"""Tests: subgroup evaluation CSV, sweep engine, LaTeX tooling, DICOM
windowing, profiling utils, hyperparam counting."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from vlp_tpu.eval.subgroup import (
    age_group,
    aggregate_across_folds,
    calculate_metrics,
    evaluate_results,
    predictions_frame,
)


def _samples(n=40, seed=0):
    rng = np.random.default_rng(seed)
    sites = ["knee", "hand"]
    return [{
        "dataset": "INTERNAL" if i % 2 == 0 else "BTXRD",
        "image_path": f"s{i}", "tumor": int(rng.random() < 0.5),
        "entity": "osteochondroma" if i % 3 == 0 else "undefined",
        "anatomy_site": sites[i % 2], "sex": "F" if i % 2 else "M",
        "age": int(rng.integers(1, 90)),
        "age_encoded": 1 + int(rng.integers(1, 90)) // 10,
    } for i in range(n)]


class TestSubgroupEval:
    def test_age_group_bins(self):
        assert age_group(0) == "0-18"
        assert age_group(18) == "0-18"
        assert age_group(19) == "19-39"
        assert age_group(39) == "19-39"
        assert age_group(40) == "40+"

    def test_calculate_metrics_single_class_nan(self):
        m = calculate_metrics(np.ones(5), np.full(5, 0.9))
        assert m["accuracy"] == 1.0
        assert np.isnan(m["roc_auc"])
        assert np.isnan(m["precision"])

    def test_long_csv_schema(self, tmp_path):
        samples = _samples()
        rng = np.random.default_rng(1)
        dfs = [predictions_frame(rng.random(len(samples)), samples)
               for _ in range(2)]
        out_file = str(tmp_path / "eval.csv")
        res = evaluate_results(out_file, dfs)
        assert list(res.columns) == ["level", "group", "fold", "metric", "value"]
        assert set(res["level"]) >= {"overall", "dataset", "entity",
                                     "anatomy_site", "sex", "age_group"}
        assert set(res["fold"]) == {0, 1}
        assert set(res[res.level == "overall"]["metric"]) == {
            "accuracy", "balanced_accuracy", "roc_auc", "precision",
            "recall", "f1_score"}
        on_disk = pd.read_csv(out_file)
        assert len(on_disk) == len(res)

    def test_overall_matches_sklearn(self):
        from sklearn.metrics import roc_auc_score

        samples = _samples()
        rng = np.random.default_rng(2)
        probs = rng.random(len(samples))
        res = evaluate_results(None, [predictions_frame(probs, samples)])
        overall = res[(res.level == "overall") & (res.metric == "roc_auc")]
        y = np.array([s["tumor"] for s in samples], float)
        assert float(overall["value"].iloc[0]) == pytest.approx(
            roc_auc_score(y, probs), abs=1e-12)

    def test_aggregate(self):
        samples = _samples()
        rng = np.random.default_rng(3)
        dfs = [predictions_frame(rng.random(len(samples)), samples)
               for _ in range(4)]
        agg = aggregate_across_folds(evaluate_results(None, dfs))
        row = agg[(agg.level == "overall") & (agg.metric == "accuracy")]
        assert int(row["count"].iloc[0]) == 4


class TestSweep:
    def _sweep_cfg(self):
        return {
            "method": "random",
            "metric": {"name": "score", "goal": "maximize"},
            "parameters": {
                "optimizer.lr": {"distribution": "log_uniform_values",
                                 "min": 1e-5, "max": 1e-2},
                "data.batch_size": {"values": [8, 16]},
            },
            "overrides": ["trainer.max_epochs=1"],
        }

    def test_random_search_finds_best(self, tmp_path):
        from vlp_tpu.train.sweep import SweepEngine

        def fake_train(cfg):
            # score is maximized at lr = 1e-3
            return {"score": -abs(np.log10(cfg.optimizer.lr) + 3)}

        eng = SweepEngine(self._sweep_cfg(), str(tmp_path), seed=0)
        best = eng.run(12, train_fn=fake_train)
        assert best["value"] > -1.5
        lines = open(eng.results_path).read().strip().splitlines()
        assert len(lines) == 12
        assert os.path.exists(tmp_path / "sweep_best.json")

    def test_grid_enumerates(self, tmp_path):
        from vlp_tpu.train.sweep import SweepEngine

        cfg = {
            "method": "grid",
            "metric": {"name": "score", "goal": "maximize"},
            "parameters": {"data.batch_size": {"values": [8, 16, 32]},
                           "optimizer.lr": {"values": [0.1, 0.2]}},
        }
        seen = []

        def fake_train(c):
            seen.append((c.data.batch_size, c.optimizer.lr))
            return {"score": 1.0}

        SweepEngine(cfg, str(tmp_path)).run(6, train_fn=fake_train)
        assert len(set(seen)) == 6

    def test_bayes_suggestion_runs(self, tmp_path):
        from vlp_tpu.train.sweep import SweepEngine

        cfg = self._sweep_cfg()
        cfg["method"] = "bayes"

        def fake_train(c):
            return {"score": -abs(np.log10(c.optimizer.lr) + 3)}

        best = SweepEngine(cfg, str(tmp_path), seed=1).run(10,
                                                           train_fn=fake_train)
        assert best["value"] is not None

    def test_failed_trial_recorded(self, tmp_path):
        from vlp_tpu.train.sweep import SweepEngine

        def fake_train(c):
            raise RuntimeError("boom")

        best = SweepEngine(self._sweep_cfg(), str(tmp_path)).run(
            2, train_fn=fake_train)
        assert best == {}


class TestLatex:
    def test_space_and_best(self, tmp_path):
        from vlp_tpu.eval.latex import best_hparams_to_latex, sweep_space_to_latex

        cfg = {"parameters": {
            "optimizer.lr": {"distribution": "log_uniform_values",
                             "min": 1e-5, "max": 1e-2},
            "data.batch_size": {"values": [8, 16]}}}
        tex = sweep_space_to_latex(cfg)
        assert r"\begin{tabular}" in tex and "log" in tex
        results = tmp_path / "r.jsonl"
        results.write_text(
            json.dumps({"trial": 0, "params": {"optimizer.lr": 1e-3},
                        "value": 0.9}) + "\n" +
            json.dumps({"trial": 1, "params": {"optimizer.lr": 1e-4},
                        "value": 0.5}) + "\n")
        tex2 = best_hparams_to_latex(str(results))
        assert "0.001" in tex2 and "0.9" in tex2

    def test_cv_summary(self, tmp_path):
        from vlp_tpu.eval.latex import cv_summary_to_latex

        p = tmp_path / "cv.json"
        p.write_text(json.dumps({"val/acc_mean": 0.8, "val/acc_std": 0.02}))
        tex = cv_summary_to_latex(str(p))
        assert "0.800" in tex and "0.020" in tex


class TestDicomWindowing:
    def test_minmax_scaling(self):
        from vlp_tpu.data.dicom_tools import window_to_uint8

        x = np.array([[0, 500], [1000, 2000]], np.int32)
        out = window_to_uint8(x)
        assert out.dtype == np.uint8
        assert out[0, 0] == 0 and out[1, 1] == 255

    def test_windowing_and_inversion(self):
        from vlp_tpu.data.dicom_tools import window_to_uint8

        x = np.array([[0.0, 100.0, 200.0]])
        out = window_to_uint8(x, window_center=100, window_width=100)
        assert out[0, 0] == 0 and out[0, 2] == 255
        inv = window_to_uint8(x, window_center=100, window_width=100,
                              photometric="MONOCHROME1")
        assert inv[0, 0] == 255 and inv[0, 2] == 0

    def test_conversion_gated_without_pydicom(self, tmp_path):
        from vlp_tpu.data.dicom_tools import convert_dicom_dir

        with pytest.raises(RuntimeError, match="pydicom"):
            convert_dicom_dir(str(tmp_path), str(tmp_path / "out"))


class TestProfilingAndHparams:
    def test_step_timer(self):
        from vlp_tpu.utils.profiling import StepTimer

        t = StepTimer(warmup=1)
        for _ in range(4):
            t.start()
            t.stop()
        stats = t.stats(batch_size=8)
        assert "step_time_ms_mean" in stats and stats["images_per_sec"] > 0

    def test_param_counts(self):
        import jax.numpy as jnp

        from vlp_tpu.config import Config
        from vlp_tpu.utils.hparams import log_hyperparameters
        from vlp_tpu.utils.logging import MemorySink

        cfg = Config()
        cfg.model.task = "only_imaging"
        cfg.model.freeze_encoder = True
        params = {"backbone": {"k": jnp.zeros((10, 10))},
                  "head": {"k": jnp.zeros((10, 1))}}
        sink = MemorySink()
        rec = log_hyperparameters(cfg, params, {}, sink)
        assert rec["model/params/total"] == 110
        assert rec["model/params/trainable"] == 10  # backbone frozen
        assert sink.summary["model/params/total"] == 110

    def test_plotting_smoke(self, tmp_path):
        from vlp_tpu.eval.plotting import plot_confusion_matrix, plot_tsne_and_silhouette

        rng = np.random.default_rng(0)
        feats = np.vstack([rng.normal(0, 1, (20, 8)),
                           rng.normal(5, 1, (20, 8))])
        labels = np.array([0] * 20 + [1] * 20)
        datasets = ["a"] * 20 + ["b"] * 20
        scores = plot_tsne_and_silhouette(feats, labels, datasets,
                                          str(tmp_path / "t.png"))
        assert (tmp_path / "t.png").exists()
        assert scores["silhouette_tumor"] > 0.3
        cm = plot_confusion_matrix(rng.random(40), labels,
                                   str(tmp_path / "c.png"))
        assert cm.sum() == 40


class TestEvalCliArgSplit:
    def test_trailing_experiment_token_is_an_override_not_a_checkpoint(self):
        """Greedy --checkpoints nargs='+' must not swallow `experiment=...`
        (it silently evaluated under the DEFAULT config before round 5)."""
        from vlp_tpu.eval.test_eval import split_overrides

        cli, ov = split_overrides(
            ["--output-file", "x.csv", "--checkpoints", "ck0", "ck1",
             "experiment=smoke_synthetic_only_imaging",
             "data.image_size=64"])
        assert ov == ["experiment=smoke_synthetic_only_imaging",
                      "data.image_size=64"]
        assert cli == ["--output-file", "x.csv",
                       "--checkpoints", "ck0", "ck1"]
        # flags with '=' after '--' stay argparse's
        cli2, ov2 = split_overrides(["--output-file=y.csv",
                                     "--checkpoints", "ck"])
        assert ov2 == [] and cli2[0] == "--output-file=y.csv"
        # checkpoint PATHS containing '=' (sweep-style dirs) are NOT
        # overrides — only dotted-identifier keys count
        cli3, ov3 = split_overrides(
            ["--checkpoints", "outputs/sweep/lr=0.001/fold0",
             "experiment=foo"])
        assert ov3 == ["experiment=foo"]
        assert cli3 == ["--checkpoints", "outputs/sweep/lr=0.001/fold0"]
