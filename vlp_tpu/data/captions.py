"""Caption pool loading + cycling assignment.

The reference pairs every MURA/LERA radiograph with an LLM-generated caption
from a static pool keyed by (anatomy_site, abnormality_label)
(res/data/pretrain/captions.csv: 880 rows, 11 sites × 2 labels). Captions
are assigned by cycling through the pool per key so the pool is used evenly
(reference MURADataset.py:70-109, LERADataset.py:73-112). The global caption
row index is recorded per sample — it becomes the caption id the
NoDuplicateCaptionSampler keys on.
"""
from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import pandas as pd

DEFAULT_CAPTIONS_CSV = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "res",
    "data",
    "pretrain",
    "captions.csv",
)


class CaptionPool:
    """Static caption pool with per-(site,label) cycling state."""

    def __init__(self, captions_csv: str = DEFAULT_CAPTIONS_CSV) -> None:
        df = pd.read_csv(captions_csv)
        required = {"anatomy_site", "abnormality_label", "caption"}
        if not required.issubset(df.columns):
            raise ValueError(
                f"Caption CSV {captions_csv} must have columns {required}"
            )
        self.df = df
        # Pre-index (site, label) -> list of (global_row_idx, caption).
        self._by_key: Dict[Tuple[str, int], List[Tuple[int, str]]] = {}
        for idx, row in df.iterrows():
            key = (str(row["anatomy_site"]), int(row["abnormality_label"]))
            self._by_key.setdefault(key, []).append((int(idx), str(row["caption"])))
        self._cycle_state: Dict[Tuple[str, int], int] = {}

    @property
    def num_captions(self) -> int:
        return len(self.df)

    def all_captions(self) -> List[str]:
        return [str(c) for c in self.df["caption"]]

    def sites(self) -> List[str]:
        return sorted({k[0] for k in self._by_key})

    def assign(self, anatomy_site: str, label: int) -> Tuple[str, int]:
        """Return (caption, global_caption_row_index), cycling through the
        pool for this (site, label). First call for a key returns entry 0,
        subsequent calls 1, 2, ..., wrapping (reference MURADataset.py:79-88)."""
        key = (anatomy_site, int(label))
        if key not in self._by_key:
            raise KeyError(
                f"No captions for anatomy_site={anatomy_site!r} label={label}; "
                f"available sites: {self.sites()}"
            )
        pool = self._by_key[key]
        if key in self._cycle_state:
            index = (self._cycle_state[key] + 1) % len(pool)
        else:
            index = 0
        self._cycle_state[key] = index
        row_idx, caption = pool[index]
        return caption, row_idx

    def assign_all(
        self, sites_and_labels: Sequence[Tuple[str, int]]
    ) -> List[Tuple[str, int]]:
        return [self.assign(site, label) for site, label in sites_and_labels]
