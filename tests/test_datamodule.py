"""Datamodule tests on synthetic fixtures: fold construction, statics,
caption-unique batching at the loader level, frozen-test semantics."""
import numpy as np
import pytest

from vlp_tpu.config import Config, get_experiment, list_experiments
from vlp_tpu.data.base import KFoldDataModule
from vlp_tpu.data.datamodule import DownstreamData, PretrainData, build_datamodule


def _downstream_cfg(n=48, folds=4):
    cfg = Config()
    cfg.data.name = "synthetic_downstream"
    cfg.data.synthetic_num_samples = n
    cfg.data.image_size = 32
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.data.n_folds_downstream = folds
    return cfg


def _pretrain_cfg(n=48, folds=5):
    cfg = Config()
    cfg.data.name = "synthetic_pretrain"
    cfg.data.synthetic_num_samples = n
    cfg.data.image_size = 32
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.data.max_token_length = 8
    cfg.data.n_folds_pretrain = folds
    return cfg


class TestDownstreamData:
    def test_fold_structure(self, tmp_path):
        cfg = _downstream_cfg()
        cfg.output_dir = str(tmp_path)
        dm = DownstreamData(cfg)
        assert isinstance(dm, KFoldDataModule)
        folds = list(dm.folds())
        assert len(folds) == 4
        f0 = folds[0]
        assert set(f0.val_loaders) <= {"internal", "btxrd"}
        assert f0.statics.std > 0
        assert abs(f0.label_weights[0] * 2 - 2) < 1.5  # sane weights
        # no val overlap between folds' val sets
        val_sets = []
        for f in folds:
            paths = set()
            for name, loader in f.val_loaders.items():
                paths |= {s["image_path"] for s in loader.bundle.samples}
            val_sets.append(paths)
        for i in range(len(val_sets)):
            for j in range(i + 1, len(val_sets)):
                assert not (val_sets[i] & val_sets[j])

    def test_test_loader_separate(self, tmp_path):
        cfg = _downstream_cfg()
        cfg.output_dir = str(tmp_path)
        dm = DownstreamData(cfg)
        test_paths = {s["image_path"] for s in dm.test}
        train_paths = {s["image_path"] for s in dm.train_val}
        assert not (test_paths & train_paths)
        loader = dm.test_loader(0)
        batches = list(loader)
        total = sum(int(np.asarray(b["mask"]).sum()) for b in batches)
        assert total == len(dm.test)

    def test_subsampling(self, tmp_path):
        cfg = _downstream_cfg(n=48)
        cfg.data.try_with_only_n_samples = 20
        cfg.output_dir = str(tmp_path)
        dm = DownstreamData(cfg)
        assert len(dm.train_val) == 20

    def test_batches_have_schema(self, tmp_path):
        cfg = _downstream_cfg()
        cfg.output_dir = str(tmp_path)
        dm = DownstreamData(cfg)
        fold = next(dm.folds())
        batch = next(iter(fold.train_loader))
        assert set(batch) == {"image_u8", "label", "dataset_id", "mask",
                              "clinical"}
        assert batch["image_u8"].shape[1:] == (32, 32)
        assert batch["clinical"].shape[1] == 15


class TestPretrainData:
    def test_caption_unique_train_batches(self, tmp_path):
        cfg = _pretrain_cfg()
        cfg.output_dir = str(tmp_path)
        dm = PretrainData(cfg)
        fold = next(dm.folds())
        n_batches = len(fold.train_loader)
        dup_batches = 0
        for batch in fold.train_loader:
            mask = np.asarray(batch["mask"]) > 0
            cids = np.asarray(batch["caption_id"])[mask]
            if len(set(cids.tolist())) != len(cids):
                dup_batches += 1
        # best-effort uniqueness: only tail batches may duplicate
        assert dup_batches <= max(1, n_batches // 4)

    def test_val_loaders_deterministic(self, tmp_path):
        cfg = _pretrain_cfg()
        cfg.output_dir = str(tmp_path)
        dm = PretrainData(cfg)
        fold = next(dm.folds())
        for name, loader in fold.val_loaders.items():
            a = [np.asarray(b["caption_id"]).tolist() for b in loader]
            b = [np.asarray(b["caption_id"]).tolist() for b in loader]
            assert a == b, f"val loader {name} not deterministic"

    def test_no_test_loader(self, tmp_path):
        cfg = _pretrain_cfg()
        cfg.output_dir = str(tmp_path)
        dm = PretrainData(cfg)
        with pytest.raises(RuntimeError, match="test"):
            dm.test_loader(0)

    def test_token_arrays_aligned(self, tmp_path):
        cfg = _pretrain_cfg()
        cfg.output_dir = str(tmp_path)
        dm = PretrainData(cfg)
        fold = next(dm.folds())
        batch = next(iter(fold.train_loader))
        assert batch["input_ids"].shape == (8, 8)
        assert batch["attention_mask"].shape == (8, 8)
        # CLS at position 0 for every row
        assert set(np.asarray(batch["input_ids"])[:, 0].tolist()) == {101}


class TestRegistryAndBuild:
    def test_build_datamodule_dispatch(self, tmp_path):
        cfg = _downstream_cfg()
        cfg.output_dir = str(tmp_path)
        assert isinstance(build_datamodule(cfg), DownstreamData)
        cfg2 = _pretrain_cfg()
        cfg2.output_dir = str(tmp_path)
        assert isinstance(build_datamodule(cfg2), PretrainData)
        cfg.data.name = "bogus"
        with pytest.raises(ValueError):
            build_datamodule(cfg)

    def test_all_experiments_construct(self):
        """Every registered experiment yields a valid config tree."""
        for name in list_experiments():
            cfg = get_experiment(name)
            assert cfg.model.task in ("only_imaging", "fusion",
                                      "vision_language")
            assert cfg.data.batch_size > 0
