"""Frozen test-split protocol + cross-validation splits.

Reproduces the reference's split-integrity machinery
(src/data/helpers/ensure_same_test_set.py):

- ``save_test_set_info`` writes ``test_set_split.csv`` (image path -> bool)
  next to the dataset so the test split is frozen on disk.
- ``save_test_set_hash`` records sha256(sorted test image paths) under
  ``datacache/<DS>_test_set_hash.txt``; loading raises on mismatch so
  training hard-fails if the frozen split drifted
  (ensure_same_test_set.py:120-124).
- CV splits reuse sklearn (host-side, like the reference):
  StratifiedGroupKFold grouped by patient where patient ids exist
  (INTERNAL/MURA/LERA), plain StratifiedKFold for BTXRD
  (INTERNALDataset.py:242-273, BTXRDDataset.py:208-235).
"""
from __future__ import annotations

import hashlib
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from sklearn.model_selection import StratifiedGroupKFold, StratifiedKFold

Sample = Dict[str, object]


def hash_list_of_strings(strings: Sequence[str]) -> str:
    """sha256 over the sorted, concatenated strings (reference
    src/data/helpers/hash_list_of_dicts.py:5-10). Used for both test-set
    hashes and preprocessing-cache keys."""
    h = hashlib.sha256()
    for s in sorted(strings):
        h.update(str(s).encode("utf-8"))
    return h.hexdigest()


# --------------------------------------------------------------------------
# Frozen test split
# --------------------------------------------------------------------------

TEST_SPLIT_FILENAME = "test_set_split.csv"


def save_test_set_info(
    samples: Sequence[Sample], test_paths: Sequence[str], dataset_dir: str
) -> str:
    """Write path -> in-test-set membership CSV into the dataset folder."""
    test_set = set(test_paths)
    df = pd.DataFrame(
        {
            "image_path": [s["image_path"] for s in samples],
            "is_test": [s["image_path"] in test_set for s in samples],
        }
    )
    out = os.path.join(dataset_dir, TEST_SPLIT_FILENAME)
    df.to_csv(out, index=False)
    return out


def save_test_set_hash(test_paths: Sequence[str], cache_dir: str, dataset_name: str) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, f"{dataset_name}_test_set_hash.txt")
    with open(out, "w") as fh:
        fh.write(hash_list_of_strings(list(test_paths)))
    return out


def check_test_set_hash(
    test_paths: Sequence[str], cache_dir: str, dataset_name: str
) -> None:
    """Raise if the frozen test split drifted from the recorded hash."""
    path = os.path.join(cache_dir, f"{dataset_name}_test_set_hash.txt")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Test-set hash file {path} is missing; refusing to proceed "
            "without split-integrity verification."
        )
    with open(path) as fh:
        expected = fh.read().strip()
    actual = hash_list_of_strings(list(test_paths))
    if actual != expected:
        raise RuntimeError(
            f"Test-set hash mismatch for {dataset_name}: the frozen test "
            f"split drifted (expected {expected[:12]}..., got {actual[:12]}...)."
        )


def load_frozen_split(
    samples: Sequence[Sample],
    dataset_dir: str,
    cache_dir: Optional[str] = None,
    dataset_name: Optional[str] = None,
) -> Tuple[List[Sample], List[Sample]]:
    """Split samples into (train, test) by membership in the frozen
    ``test_set_split.csv``; raises if the file is absent (the reference's
    FileNotFoundError tripwire, INTERNALDataset.py:211-213)."""
    split_path = os.path.join(dataset_dir, TEST_SPLIT_FILENAME)
    if not os.path.exists(split_path):
        raise FileNotFoundError(
            f"Frozen test split {split_path} not found. Create it once with "
            "create_frozen_split() and commit it with the dataset."
        )
    df = pd.read_csv(split_path)
    is_test = {
        str(p): bool(t) for p, t in zip(df["image_path"], df["is_test"])
    }
    train, test = [], []
    for s in samples:
        key = str(s["image_path"])
        if key not in is_test:
            raise KeyError(
                f"Sample {key} missing from frozen split {split_path}; "
                "the dataset drifted relative to the frozen split."
            )
        (test if is_test[key] else train).append(s)
    if cache_dir is not None and dataset_name is not None:
        check_test_set_hash([s["image_path"] for s in test], cache_dir, dataset_name)
    return train, test


def create_frozen_split(
    samples: Sequence[Sample],
    dataset_dir: str,
    *,
    stratify_keys: Sequence[str],
    group_key: Optional[str] = None,
    test_size: float = 0.2,
    seed: int = 17,
    cache_dir: Optional[str] = None,
    dataset_name: Optional[str] = None,
) -> Tuple[List[Sample], List[Sample]]:
    """One-time creation of the frozen test split.

    Reference semantics: INTERNAL uses StratifiedGroupKFold(5) grouped by
    patient with stratification on (tumor, anatomy_site), taking one fold as
    test (INTERNALDataset.py:221-240); BTXRD uses a stratified 20% holdout
    (BTXRDDataset.py:189-197). Here both are expressed as grouped-or-plain
    stratified k-fold with k = round(1/test_size).
    """
    samples = list(samples)
    y = _stratify_labels(samples, stratify_keys)
    n_splits = max(2, round(1.0 / test_size))
    if group_key is not None:
        groups = np.array([str(s[group_key]) for s in samples])
        splitter = StratifiedGroupKFold(n_splits=n_splits, shuffle=True, random_state=seed)
        train_idx, test_idx = next(splitter.split(np.zeros(len(y)), y, groups))
    else:
        splitter = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
        train_idx, test_idx = next(splitter.split(np.zeros(len(y)), y))
    test_paths = [samples[i]["image_path"] for i in test_idx]
    save_test_set_info(samples, test_paths, dataset_dir)
    if cache_dir is not None and dataset_name is not None:
        save_test_set_hash(test_paths, cache_dir, dataset_name)
    return [samples[i] for i in train_idx], [samples[i] for i in test_idx]


def _stratify_labels(samples: Sequence[Sample], keys: Sequence[str]) -> np.ndarray:
    return np.array(
        ["|".join(str(s.get(k, "undefined")) for k in keys) for s in samples]
    )


# Joint CV stratification keys, matching the reference label strings:
# INTERNAL f"{tumor}, {anatomy_site}" (INTERNALDataset.py:259), MURA/LERA
# f"{label}, {anatomy_site}" (MURADataset.py:272, LERADataset.py:255). The
# separator differs ('|' vs ', ') but sklearn stratification only depends on
# the label PARTITION, which is identical.
DOWNSTREAM_STRATIFY = ("tumor", "anatomy_site")
PRETRAIN_STRATIFY = ("label", "anatomy_site")


def btxrd_stratify_label(s: Sample) -> str:
    """BTXRD stratifies healthy samples as site 'undefined' so the val split
    matches the pre-site-annotation splits (BTXRDDataset.py:227-229)."""
    site = s["anatomy_site"] if int(s["tumor"]) == 1 else "undefined"
    return f"{s['tumor']}|{site}"


# --------------------------------------------------------------------------
# Cross-validation splits
# --------------------------------------------------------------------------

def cv_splits(
    samples: Sequence[Sample],
    *,
    n_splits: int,
    stratify_keys: Optional[Sequence[str]] = None,
    stratify_fn=None,
    group_key: Optional[str] = None,
    seed: int = 42,
) -> List[Tuple[List[int], List[int]]]:
    """Yield (train_idx, val_idx) per fold. Grouped variant prevents patient
    leakage (reference INTERNALDataset.py:242-273 / MURADataset.py:261-289
    group by patient; BTXRD uses plain StratifiedKFold). ``stratify_fn``
    overrides key-joining for per-sample label rules (BTXRD healthy sites)."""
    samples = list(samples)
    if stratify_fn is not None:
        y = np.array([str(stratify_fn(s)) for s in samples])
    else:
        y = _stratify_labels(samples, stratify_keys)

    def run(labels):
        if group_key is not None:
            groups = np.array([str(s[group_key]) for s in samples])
            splitter = StratifiedGroupKFold(n_splits=n_splits, shuffle=True,
                                            random_state=seed)
            return list(splitter.split(np.zeros(len(labels)), labels, groups))
        splitter = StratifiedKFold(n_splits=n_splits, shuffle=True,
                                   random_state=seed)
        return list(splitter.split(np.zeros(len(labels)), labels))

    try:
        splits = run(y)
    except ValueError:
        # Joint (label, site) classes can be thinner than n_splits on tiny
        # fixtures/subsampled runs — a regime where the reference's sklearn
        # call would crash outright. Degrade to the primary key (the part
        # before the first '|') and say so.
        primary = np.array([label.split("|", 1)[0] for label in y])
        if len(set(primary)) == len(set(y)):
            raise
        import warnings

        warnings.warn(
            f"joint stratification infeasible for n_splits={n_splits} "
            "(a class has fewer members than folds); falling back to the "
            "primary label only", stacklevel=2)
        splits = run(primary)
    return [(list(tr), list(va)) for tr, va in splits]


def assert_no_group_leakage(
    train: Sequence[Sample], other: Sequence[Sample], group_key: str
) -> None:
    """Patient-leakage tripwire (reference INTERNALDataset.py:77-82)."""
    g_train = {str(s[group_key]) for s in train}
    g_other = {str(s[group_key]) for s in other}
    overlap = g_train & g_other
    if overlap:
        raise AssertionError(
            f"Group leakage across splits for {group_key!r}: "
            f"{sorted(overlap)[:5]}{'...' if len(overlap) > 5 else ''}"
        )


def class_weights(labels: Sequence[int], num_classes: int = 2) -> Tuple[float, ...]:
    """w_c = N / (num_classes * N_c) (reference DownstreamDataModule.py:328-332)."""
    labels = np.asarray(labels)
    n = len(labels)
    weights = []
    for c in range(num_classes):
        n_c = int((labels == c).sum())
        weights.append(n / (num_classes * n_c) if n_c > 0 else 0.0)
    return tuple(weights)
