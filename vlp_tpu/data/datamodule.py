"""DataModules: fold-wise loader construction for downstream and pretrain.

Reference equivalents: src/data/DownstreamDataModule.py (INTERNAL+BTXRD,
4-fold CV, per-fold scalar mean/std + class weights, frozen combined test
split) and src/data/PretrainDataModule.py (LERA+MURA, 5-fold CV, joint
caption tokenization, NoDuplicateCaptionSampler batching). Both yield
fixed-shape device loaders over the deterministic uint8 image cache; the
synthetic variants plug the same machinery into generated fixtures so CI
never needs the real corpora.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Generator, List, Optional, Tuple

import numpy as np

from vlp_tpu.config import Config
from vlp_tpu.data import synthetic
from vlp_tpu.data.captions import DEFAULT_CAPTIONS_CSV, CaptionPool
from vlp_tpu.data.pipeline import ArrayBundle, DeviceLoader
from vlp_tpu.data.preprocess_host import ImageCache, fold_mean_std
from vlp_tpu.data.sampler import NoDuplicateCaptionSampler, ShuffleBatchSampler
from vlp_tpu.data.splits import (
    DOWNSTREAM_STRATIFY,
    PRETRAIN_STRATIFY,
    btxrd_stratify_label,
    class_weights,
    cv_splits,
)
from vlp_tpu.data.tokenize import tokenize_all_captions
from vlp_tpu.models.tasks import TaskStatics
from vlp_tpu.ops.augment import AugmentConfig
from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass
class Fold:
    index: int
    train_loader: DeviceLoader
    val_loaders: Dict[str, DeviceLoader]
    statics: TaskStatics
    label_weights: Tuple[float, float]


def _augment_config(cfg: Config) -> AugmentConfig:
    return AugmentConfig(
        enabled=not cfg.data.disable_augmentations,
        noise_prob=0.5 if cfg.data.gaussian_noise_augmentation else 0.0,
        shear_deg=5.0 if cfg.data.shear_augmentation else 0.0,
    )


def _subsample(samples: List[dict], n: Optional[int], seed: int) -> List[dict]:
    """try_with_only_n_samples (reference DownstreamDataModule.py:284-300)."""
    if n is None or n >= len(samples):
        return samples
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(samples), size=n, replace=False)
    return [samples[i] for i in idx]


class DownstreamData:
    """INTERNAL+BTXRD; folds combine each dataset's own CV splits
    (INTERNAL grouped by patient, BTXRD ungrouped — reference
    DownstreamDataModule.py:255-337)."""

    def __init__(self, cfg: Config, mesh=None, cache_dir: Optional[str] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.cache_dir = cache_dir or os.path.join(cfg.output_dir, "datacache")
        d = cfg.data
        if d.name == "synthetic_downstream":
            samples, cache = synthetic.make_synthetic_downstream(
                d.synthetic_num_samples, d.image_size, seed=d.seed,
                crop=d.crop_larger_dimension)
            self.train_val, self.cache = samples, cache
            # frozen "test" split for synthetic: last 25%
            n_test = max(1, len(samples) // 4)
            self.test = self.train_val[-n_test:]
            self.train_val = self.train_val[:-n_test]
            self._cache_index = {s["image_path"]: i
                                 for i, s in enumerate(samples)}
        else:
            from vlp_tpu.data.datasets import BTXRDDataset, InternalDataset

            internal = InternalDataset(cache_dir=self.cache_dir)
            btxrd = BTXRDDataset(cache_dir=self.cache_dir)
            self.train_val = list(internal.train_val) + list(btxrd.train_val)
            self.test = list(internal.test) + list(btxrd.test)
            paths = [s["image_path"] for s in self.train_val + self.test]
            self.cache = ImageCache.build(
                paths, self.cache_dir, image_size=d.image_size,
                crop=d.crop_larger_dimension,
                maximum_crop_ratio=d.maximum_crop_ratio)
            self._cache_index = {p: i for i, p in enumerate(paths)}
        self.train_val = _subsample(self.train_val,
                                    d.try_with_only_n_samples, d.seed)
        self._statics_cache: Dict[int, TaskStatics] = {}

    def _indices(self, samples: List[dict]) -> List[int]:
        return [self._cache_index[s["image_path"]] for s in samples]

    def _bundle(self, samples: List[dict]) -> ArrayBundle:
        return ArrayBundle(samples, self.cache, self._indices(samples))

    def _fold_splits(self) -> List[Tuple[List[dict], List[dict]]]:
        d = self.cfg.data
        internal = [s for s in self.train_val if s["dataset"] == "INTERNAL"]
        btxrd = [s for s in self.train_val if s["dataset"] == "BTXRD"]
        folds_i = cv_splits(internal, n_splits=d.n_folds_downstream,
                            stratify_keys=DOWNSTREAM_STRATIFY,
                            group_key="patient_number", seed=d.seed) \
            if internal else [( [], [] )] * d.n_folds_downstream
        folds_b = cv_splits(btxrd, n_splits=d.n_folds_downstream,
                            stratify_fn=btxrd_stratify_label, group_key=None,
                            seed=d.seed) if btxrd else \
            [([], [])] * d.n_folds_downstream
        out = []
        for k in range(d.n_folds_downstream):
            tr = [internal[i] for i in folds_i[k][0]] + \
                 [btxrd[i] for i in folds_b[k][0]]
            va_internal = [internal[i] for i in folds_i[k][1]]
            va_btxrd = [btxrd[i] for i in folds_b[k][1]]
            out.append((tr, {"internal": va_internal, "btxrd": va_btxrd}))
        return out

    def folds(self) -> Generator[Fold, None, None]:
        cfg = self.cfg
        d = cfg.data
        for k, (train, vals) in enumerate(self._fold_splits()):
            mean, std = fold_mean_std(self.cache, self._indices(train),
                                      self.cache_dir)
            weights = class_weights([s["tumor"] for s in train])
            statics = TaskStatics(
                mean=mean, std=std, class_weights=weights,
                out_channels=d.in_channels,
                scale_intensity=d.scale_intensity_normalization,
                augment=_augment_config(cfg))
            self._statics_cache[k] = statics
            train_loader = DeviceLoader(
                self._bundle(train),
                ShuffleBatchSampler(len(train), d.batch_size, seed=d.seed + k),
                d.batch_size, self.mesh, cfg.mesh.axis_name, d.prefetch_depth)
            val_loaders = {
                name: DeviceLoader(
                    self._bundle(v),
                    ShuffleBatchSampler(len(v), d.eval_batch_size,
                                        shuffle=False),
                    d.eval_batch_size, self.mesh, cfg.mesh.axis_name,
                    d.prefetch_depth)
                for name, v in vals.items() if len(v) > 0}
            yield Fold(k, train_loader, val_loaders, statics, weights)

    def test_loader(self, fold: int) -> DeviceLoader:
        """Frozen combined test split with fold-matched normalization
        (reference DownstreamDataModule.py:340-383)."""
        if fold not in self._statics_cache:
            for _ in self.folds():
                pass
        d = self.cfg.data
        return DeviceLoader(
            self._bundle(self.test),
            ShuffleBatchSampler(len(self.test), d.eval_batch_size,
                                shuffle=False),
            d.eval_batch_size, self.mesh, self.cfg.mesh.axis_name,
            d.prefetch_depth)

    def fold_statics(self, fold: int) -> TaskStatics:
        if fold not in self._statics_cache:
            for _ in self.folds():
                pass
        return self._statics_cache[fold]


class PretrainData:
    """LERA+MURA with caption-unique batching and joint tokenization
    (reference PretrainDataModule.py)."""

    def __init__(self, cfg: Config, mesh=None, cache_dir: Optional[str] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.cache_dir = cache_dir or os.path.join(cfg.output_dir, "datacache")
        d = cfg.data
        if d.name == "synthetic_pretrain":
            samples, cache = synthetic.make_synthetic_pretrain(
                d.synthetic_num_samples, d.image_size, seed=d.seed,
                captions_csv=d.captions_csv)
            self.train_val = samples
            self.cache = cache
            self._cache_index = {s["image_path"]: i
                                 for i, s in enumerate(samples)}
        else:
            from vlp_tpu.data.datasets import LERADataset, MURADataset

            pool = CaptionPool(d.captions_csv or DEFAULT_CAPTIONS_CSV)
            lera = LERADataset(pool, cache_dir=self.cache_dir)
            mura = MURADataset(pool, cache_dir=self.cache_dir)
            self.train_val = list(lera.train_val) + list(mura.train_val)
            paths = [s["image_path"] for s in self.train_val]
            self.cache = ImageCache.build(paths, self.cache_dir,
                                          image_size=d.image_size)
            self._cache_index = {p: i for i, p in enumerate(paths)}
        self.train_val = _subsample(self.train_val,
                                    d.try_with_only_n_samples, d.seed)
        self._statics_cache: Dict[int, TaskStatics] = {}

    def _indices(self, samples: List[dict]) -> List[int]:
        return [self._cache_index[s["image_path"]] for s in samples]

    def _bundle(self, samples: List[dict], tokens) -> ArrayBundle:
        ids, mask = tokens
        return ArrayBundle(samples, self.cache, self._indices(samples),
                           token_ids=ids, token_mask=mask)

    def folds(self) -> Generator[Fold, None, None]:
        cfg = self.cfg
        d = cfg.data
        lera = [s for s in self.train_val if s["dataset"] == "LERA"]
        mura = [s for s in self.train_val if s["dataset"] == "MURA"]
        folds_l = cv_splits(lera, n_splits=d.n_folds_pretrain,
                            stratify_keys=PRETRAIN_STRATIFY,
                            group_key="case_number", seed=d.seed) \
            if lera else [([], [])] * d.n_folds_pretrain
        folds_m = cv_splits(mura, n_splits=d.n_folds_pretrain,
                            stratify_keys=PRETRAIN_STRATIFY,
                            group_key="patient_id", seed=d.seed) if mura else \
            [([], [])] * d.n_folds_pretrain
        for k in range(d.n_folds_pretrain):
            train = [lera[i] for i in folds_l[k][0]] + \
                    [mura[i] for i in folds_m[k][0]]
            val_l = [lera[i] for i in folds_l[k][1]]
            val_m = [mura[i] for i in folds_m[k][1]]
            tokens = tokenize_all_captions(
                {"train": train, "lera": val_l, "mura": val_m},
                d.tokenizer, d.max_token_length)
            mean, std = fold_mean_std(self.cache, self._indices(train),
                                      self.cache_dir)
            statics = TaskStatics(mean=mean, std=std,
                                  out_channels=d.in_channels,
                                  scale_intensity=d.scale_intensity_normalization,
                                  augment=_augment_config(cfg))
            self._statics_cache[k] = statics
            train_loader = DeviceLoader(
                self._bundle(train, tokens["train"]),
                NoDuplicateCaptionSampler(
                    len(train), [s["caption_id"] for s in train],
                    d.batch_size, probabilistic_mode=d.sampler_mode_train,
                    seed=d.seed + k),
                d.batch_size, self.mesh, cfg.mesh.axis_name, d.prefetch_depth)
            val_loaders = {}
            for name, vs, toks in (("lera", val_l, tokens["lera"]),
                                   ("mura", val_m, tokens["mura"])):
                if not vs:
                    continue
                val_loaders[name] = DeviceLoader(
                    self._bundle(vs, toks),
                    NoDuplicateCaptionSampler(
                        len(vs), [s["caption_id"] for s in vs],
                        d.eval_batch_size,
                        probabilistic_mode=d.sampler_mode_val,
                        deterministic=True, seed=d.seed),
                    d.eval_batch_size, self.mesh, cfg.mesh.axis_name,
                    d.prefetch_depth)
            yield Fold(k, train_loader, val_loaders, statics, (1.0, 1.0))

    def test_loader(self, fold: int):
        raise RuntimeError(
            "PretrainData deliberately exposes no test loader — the MURA "
            "test split must not be consumed during pretraining "
            "(reference PretrainDataModule.py:351-359).")


def build_datamodule(cfg: Config, mesh=None, cache_dir: Optional[str] = None):
    name = cfg.data.name
    if name in ("downstream", "synthetic_downstream"):
        return DownstreamData(cfg, mesh, cache_dir)
    if name in ("pretrain", "synthetic_pretrain"):
        return PretrainData(cfg, mesh, cache_dir)
    raise ValueError(f"unknown data module {name!r}")
