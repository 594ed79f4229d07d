"""Batch inference / serving entry point.

The reference has no serving path (research code); this provides the
production-shaped one: load a trained checkpoint, preprocess raw images
through the same deterministic pipeline (native C++ when available), and
run batched TPU inference — either over a directory of images (CLI) or via
the ``Predictor`` API for embedding into a server.

Usage:
  python -m vlp_tpu.serve --checkpoint ck_dir --images dir/ --output preds.csv \
      [experiment=... overrides] [--mean M --std S]
"""
from __future__ import annotations

import argparse
import glob
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vlp_tpu.config import Config, apply_overrides
from vlp_tpu.data.preprocess_host import preprocess_image
from vlp_tpu.models.tasks import TaskStatics, build_task
from vlp_tpu.utils import checkpoint as ckpt
from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class Predictor:
    """Checkpointed model + jitted batched predict with fixed batch shape
    (pads ragged tails; one compilation, stable latency)."""

    def __init__(self, cfg: Config, checkpoint_path: str,
                 mean: float, std: float, batch_size: int = 64) -> None:
        self.cfg = cfg
        self.batch_size = batch_size
        self.statics = TaskStatics(
            mean=mean, std=std, out_channels=cfg.data.in_channels,
            scale_intensity=cfg.data.scale_intensity_normalization)
        self.task = build_task(cfg, self.statics)
        dummy = self._dummy_batch()
        variables = self.task.init_variables(jax.random.key(0), dummy)
        tree = ckpt.restore(checkpoint_path, {
            "params": variables["params"],
            "extra_vars": {k: v for k, v in variables.items()
                           if k != "params"}})
        self.variables = {"params": tree["params"], **tree["extra_vars"]}
        self._predict = jax.jit(
            lambda v, b: self.task.eval_fn(v, b)["logits"])
        logger.info("Predictor ready (%s/%s, batch %d)",
                    cfg.model.task, cfg.model.model, batch_size)

    def _dummy_batch(self) -> Dict:
        s = self.cfg.data.image_size
        b = self.batch_size
        return {
            "image_u8": jnp.zeros((b, s, s), jnp.uint8),
            "label": jnp.zeros((b,), jnp.int32),
            "dataset_id": jnp.zeros((b,), jnp.int32),
            "clinical": jnp.zeros((b, 15), jnp.float32),
            "mask": jnp.ones((b,), jnp.float32),
        }

    def predict_arrays(self, images_u8: np.ndarray,
                       clinical: Optional[np.ndarray] = None) -> np.ndarray:
        """[N, S, S] uint8 (already deterministically preprocessed) ->
        [N] tumor probabilities."""
        n = images_u8.shape[0]
        probs = np.zeros(n, np.float32)
        for start in range(0, n, self.batch_size):
            chunk = images_u8[start : start + self.batch_size]
            m = len(chunk)
            batch = self._dummy_batch()
            img = np.zeros_like(np.asarray(batch["image_u8"]))
            img[:m] = chunk
            batch["image_u8"] = jnp.asarray(img)
            if clinical is not None:
                cl = np.zeros((self.batch_size, 15), np.float32)
                cl[:m] = clinical[start : start + self.batch_size]
                batch["clinical"] = jnp.asarray(cl)
            logits = np.asarray(jax.device_get(
                self._predict(self.variables, batch)))[:m]
            probs[start : start + m] = 1.0 / (1.0 + np.exp(-logits))
        return probs

    def predict_files(self, paths: Sequence[str]) -> np.ndarray:
        imgs = np.stack([
            preprocess_image(p, image_size=self.cfg.data.image_size,
                             crop=self.cfg.data.crop_larger_dimension,
                             use_native=True)
            for p in paths])
        return self.predict_arrays(imgs)


def main(argv: Optional[List[str]] = None) -> int:
    import sys

    import pandas as pd

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--images", required=True,
                        help="directory of PNGs (recursive) or one file")
    parser.add_argument("--output", default="predictions.csv")
    parser.add_argument("--mean", type=float, default=128.0,
                        help="fold-train normalization mean")
    parser.add_argument("--std", type=float, default=64.0)
    parser.add_argument("--batch-size", type=int, default=64)
    args, overrides = parser.parse_known_args(
        argv if argv is not None else sys.argv[1:])
    cfg = apply_overrides(Config(), overrides)
    if os.path.isdir(args.images):
        paths = sorted(
            glob.glob(os.path.join(args.images, "**", "*.png"),
                      recursive=True)
            + glob.glob(os.path.join(args.images, "**", "*.jpg"),
                        recursive=True))
    else:
        paths = [args.images]
    if not paths:
        raise FileNotFoundError(f"no images under {args.images}")
    predictor = Predictor(cfg, args.checkpoint, args.mean, args.std,
                          args.batch_size)
    probs = predictor.predict_files(paths)
    pd.DataFrame({"image_path": paths, "tumor_prob": probs}).to_csv(
        args.output, index=False)
    logger.info("Wrote %d predictions to %s", len(paths), args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
