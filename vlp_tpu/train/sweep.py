"""Hyperparameter sweeps.

The reference runs wandb bayes sweeps over scheduler/optimizer/lr/batch/
embedding_dim, with fixed hydra overrides passed through the sweep command
(reference configs/sweeps/**, scripts/create_sweep_from_config.sh). This is
the offline-first equivalent: the SAME YAML schema (method / metric /
parameters / command overrides) driven by a built-in engine — random search,
grid search, or a lightweight Bayesian strategy (Thompson-style sampling
over a random-forest surrogate via sklearn) — executing trials in-process
and recording results to JSONL. When wandb is importable the config can be
handed to a real wandb sweep instead.

Sweep YAML example (wandb-compatible):
    method: random            # random | grid | bayes
    metric: {name: val/combined/accuracy, goal: maximize}
    parameters:
      optimizer.lr: {distribution: log_uniform_values, min: 1e-5, max: 1e-2}
      data.batch_size: {values: [32, 64, 128]}
    overrides: [experiment=baseline_only_imaging_resnet34, trainer.max_epochs=5]
"""
from __future__ import annotations

import itertools
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np
import yaml

from vlp_tpu.config import Config, apply_overrides
from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def sample_parameter(rng: np.random.Generator, spec: Dict[str, Any]) -> Any:
    if "values" in spec:
        vals = spec["values"]
        return vals[int(rng.integers(len(vals)))]
    if "value" in spec:
        return spec["value"]
    dist = spec.get("distribution", "uniform")
    lo, hi = float(spec["min"]), float(spec["max"])
    if dist in ("log_uniform_values", "log_uniform"):
        return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
    if dist == "int_uniform":
        return int(rng.integers(int(lo), int(hi) + 1))
    return float(rng.uniform(lo, hi))


def grid_space(parameters: Dict[str, Dict]) -> List[Dict[str, Any]]:
    keys = list(parameters)
    values = []
    for k in keys:
        spec = parameters[k]
        if "values" not in spec:
            raise ValueError(f"grid sweeps need 'values' for {k}")
        values.append(spec["values"])
    return [dict(zip(keys, combo)) for combo in itertools.product(*values)]


class SweepEngine:
    def __init__(self, sweep_config: Dict[str, Any], output_dir: str,
                 seed: int = 0) -> None:
        self.cfg = sweep_config
        self.method = sweep_config.get("method", "random")
        metric = sweep_config.get("metric", {})
        self.metric_name = metric.get("name", "val/combined/accuracy")
        self.maximize = metric.get("goal", "maximize") == "maximize"
        self.parameters: Dict[str, Dict] = sweep_config.get("parameters", {})
        self.overrides: List[str] = list(sweep_config.get("overrides", []))
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.results_path = os.path.join(output_dir, "sweep_results.jsonl")
        self.rng = np.random.default_rng(seed)
        self.history: List[Dict[str, Any]] = []

    # -- candidate generation ------------------------------------------------
    def _suggest(self, trial: int) -> Dict[str, Any]:
        if self.method == "grid":
            space = grid_space(self.parameters)
            return space[trial % len(space)]
        if self.method == "bayes" and len(self.history) >= 5:
            return self._suggest_bayes()
        return {k: sample_parameter(self.rng, s)
                for k, s in self.parameters.items()}

    def _suggest_bayes(self) -> Dict[str, Any]:
        """Surrogate-based suggestion: fit a random forest on history, score
        a pool of random candidates, pick the predicted best (Thompson-ish
        via per-tree sampling)."""
        from sklearn.ensemble import RandomForestRegressor

        done = [h for h in self.history if h.get("value") is not None]
        if not done:  # every recorded trial failed: nothing to fit
            return {k: sample_parameter(self.rng, s)
                    for k, s in self.parameters.items()}
        keys = list(self.parameters)
        x = np.array([[self._numeric(h["params"][k]) for k in keys]
                      for h in done])
        y = np.array([h["value"] for h in done], float)
        if not self.maximize:
            y = -y
        rf = RandomForestRegressor(
            n_estimators=30,
            random_state=int(self.rng.integers(2**31))).fit(x, y)
        pool = [{k: sample_parameter(self.rng, self.parameters[k])
                 for k in keys} for _ in range(64)]
        px = np.array([[self._numeric(c[k]) for k in keys] for c in pool])
        # Thompson sampling: one random tree scores the pool
        tree = rf.estimators_[int(self.rng.integers(len(rf.estimators_)))]
        return pool[int(np.argmax(tree.predict(px)))]

    @staticmethod
    def _numeric(v: Any) -> float:
        if isinstance(v, (int, float)):
            return float(v)
        # stable across processes (builtin hash() is randomized per run,
        # which would make surrogate suggestions irreproducible)
        import hashlib

        digest = hashlib.sha1(str(v).encode()).digest()
        return float(int.from_bytes(digest[:4], "big") % 10_000)

    # -- execution -----------------------------------------------------------
    def run(self, num_trials: int, train_fn=None) -> Dict[str, Any]:
        """train_fn(cfg) -> metrics dict; defaults to the real driver."""
        if train_fn is None:
            from vlp_tpu.train.driver import train as train_fn  # noqa

        best = None
        for trial in range(num_trials):
            params = self._suggest(trial)
            overrides = self.overrides + [f"{k}={v}" for k, v in params.items()]
            cfg = apply_overrides(Config(), overrides)
            cfg.output_dir = os.path.join(self.output_dir, f"trial{trial}")
            logger.info("sweep trial %d: %s", trial, params)
            try:
                metrics = train_fn(cfg)
                value = self._extract(metrics)
            except Exception as e:
                logger.warning("trial %d failed: %s", trial, e)
                value = None
            rec = {"trial": trial, "params": params, "value": value}
            self.history.append(rec)
            with open(self.results_path, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            if value is not None and (
                    best is None
                    or (value > best["value"]) == self.maximize
                    and value != best["value"]):
                best = rec
        logger.info("sweep best: %s", best)
        with open(os.path.join(self.output_dir, "sweep_best.json"), "w") as fh:
            json.dump(best, fh, indent=2)
        return best or {}

    def _extract(self, metrics: Dict[str, float]) -> Optional[float]:
        # exact key, else best-epoch snapshot key, else mean-aggregated key
        for key in (self.metric_name,
                    f"{self.metric_name}_mean",
                    f"{self.metric_name}_best_{self.metric_name}"):
            if key in metrics:
                return float(metrics[key])
        # snapshot form "<monitor>_best_<metric>_mean"
        for k, v in metrics.items():
            if k.endswith(f"_best_{self.metric_name}_mean") or \
                    k.endswith(f"_best_{self.metric_name}"):
                return float(v)
        logger.warning("metric %s not found in results (have %s)",
                       self.metric_name, sorted(metrics)[:10])
        return None


def load_sweep(path: str) -> Dict[str, Any]:
    with open(path) as fh:
        return yaml.safe_load(fh)


def to_wandb_config(sweep_config: Dict[str, Any],
                    program: str = "train.py") -> Dict[str, Any]:
    """Convert our offline sweep schema to the exact wandb-agent form the
    reference uses (configs/sweeps/pretrain/vlp_resnet34.yaml:21-40,
    scripts/create_sweep_from_config.sh): fixed overrides ride in
    ``command:`` ahead of ``${args_no_hyphens}``. Hand the result to
    ``wandb sweep`` on a connected machine; this environment is zero-egress
    so the handoff is emitted, not executed."""
    out = {
        "program": program,
        "method": sweep_config.get("method", "bayes"),
        "metric": dict(sweep_config.get("metric", {})),
        "parameters": {k: dict(v) for k, v in
                       sweep_config.get("parameters", {}).items()},
        "command": (["python", "${program}"]
                    + list(sweep_config.get("overrides", []))
                    + ["${args_no_hyphens}"]),
    }
    return out


def emit_wandb_sweep(sweep_path: str, out_path: str,
                     program: str = "train.py") -> str:
    cfg = to_wandb_config(load_sweep(sweep_path), program)
    with open(out_path, "w") as fh:
        yaml.safe_dump(cfg, fh, sort_keys=False)
    logger.info("wandb sweep config written to %s; on a connected machine: "
                "wandb sweep %s && wandb agent <id>", out_path, out_path)
    return out_path


def main(argv: Optional[List[str]] = None) -> int:
    import argparse
    import sys

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("sweep_config")
    parser.add_argument("--trials", type=int, default=10)
    parser.add_argument("--output-dir", default="outputs/sweep")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--emit-wandb", metavar="OUT_YAML", default=None,
        help="write the wandb-agent form of this sweep and exit "
             "(the reference's create_sweep_from_config.sh handoff)")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    if args.emit_wandb:
        emit_wandb_sweep(args.sweep_config, args.emit_wandb)
        return 0
    engine = SweepEngine(load_sweep(args.sweep_config), args.output_dir,
                         args.seed)
    engine.run(args.trials)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
