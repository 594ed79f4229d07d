"""Unit tests for the host-side data core: encodings, taxonomy, splits,
captions, samplers — goldens derived from the reference semantics
(SURVEY.md §2.3)."""
import os

import numpy as np
import pytest

from vlp_tpu.data import encoding
from vlp_tpu.data.captions import DEFAULT_CAPTIONS_CSV, CaptionPool
from vlp_tpu.data.sampler import (
    NoDuplicateCaptionSampler,
    ShuffleBatchSampler,
    pad_batch_indices,
)
from vlp_tpu.data.splits import (
    assert_no_group_leakage,
    class_weights,
    create_frozen_split,
    cv_splits,
    hash_list_of_strings,
    load_frozen_split,
)
from vlp_tpu.data.taxonomy import get_combined_anatomy_site_category


class TestEncoding:
    def test_sex(self):
        assert encoding.encode_sex("F") == 1.0
        assert encoding.encode_sex("M") == 0.0
        with pytest.raises(ValueError):
            encoding.encode_sex("W")

    def test_age_bins(self):
        # reference encoding.py:11-31: 10-year bins, 60+ -> bin 7
        assert encoding.encode_age(0) == 1
        assert encoding.encode_age(9) == 1
        assert encoding.encode_age(10) == 2
        assert encoding.encode_age(59) == 6
        assert encoding.encode_age(60) == 7
        assert encoding.encode_age(95) == 7
        with pytest.raises(ValueError):
            encoding.encode_age(-1)

    def test_anatomy_onehot(self):
        v = encoding.encode_anatomy_site("spine")
        assert v.shape == (13,)
        assert v.sum() == 1.0
        assert v[encoding.ANATOMY_SITES.index("spine")] == 1.0
        with pytest.raises(ValueError):
            encoding.encode_anatomy_site("head")

    def test_clinical_vector(self):
        v = encoding.clinical_vector("knee", 45, "F")
        assert v.shape == (encoding.CLINICAL_DIM,)
        assert v[-1] == 1.0  # sex
        assert v[-2] == 5.0  # age bin for 45
        assert v[:13].sum() == 1.0


class TestTaxonomy:
    def test_internal_latin(self):
        assert get_combined_anatomy_site_category(["Clavicula"]) == "shoulder"
        assert get_combined_anatomy_site_category(["Manus"]) == "hand"
        assert get_combined_anatomy_site_category(["Pes"]) == "foot"

    def test_btxrd_multisite(self):
        assert get_combined_anatomy_site_category(["tibia", "fibula"]) == "lower leg"
        assert (
            get_combined_anatomy_site_category(["tibia", "fibula", "femur"]) == "leg"
        )
        assert get_combined_anatomy_site_category(["ulna", "humerus"]) == "arm"

    def test_errors(self):
        with pytest.raises(ValueError):
            get_combined_anatomy_site_category([])
        with pytest.raises(KeyError):
            get_combined_anatomy_site_category(["skull"])

    def test_all_map_into_vocab(self):
        from vlp_tpu.data.taxonomy import _SITE_MAP

        assert set(_SITE_MAP.values()) <= set(encoding.ANATOMY_SITES)


class TestSplits:
    def _samples(self, n=100):
        rng = np.random.default_rng(0)
        return [
            {
                "image_path": f"/d/img{i}.png",
                "tumor": int(rng.random() < 0.5),
                "anatomy_site": ["knee", "hand", "spine"][i % 3],
                "patient_number": f"P{i // 3}",
            }
            for i in range(n)
        ]

    def test_hash_order_invariant(self):
        assert hash_list_of_strings(["b", "a"]) == hash_list_of_strings(["a", "b"])
        assert hash_list_of_strings(["a"]) != hash_list_of_strings(["b"])

    def test_frozen_split_roundtrip(self, tmp_path):
        samples = self._samples()
        train, test = create_frozen_split(
            samples, str(tmp_path), stratify_keys=("tumor",),
            group_key="patient_number", test_size=0.2, seed=17,
            cache_dir=str(tmp_path / "datacache"), dataset_name="TEST")
        assert len(train) + len(test) == len(samples)
        assert 0.1 < len(test) / len(samples) < 0.3
        train2, test2 = load_frozen_split(
            samples, str(tmp_path), cache_dir=str(tmp_path / "datacache"),
            dataset_name="TEST")
        assert [s["image_path"] for s in test2] == [s["image_path"] for s in test]
        assert_no_group_leakage(train2, test2, "patient_number")

    def test_frozen_split_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_frozen_split(self._samples(), str(tmp_path))

    def test_hash_mismatch_raises(self, tmp_path):
        samples = self._samples()
        create_frozen_split(
            samples, str(tmp_path), stratify_keys=("tumor",),
            group_key="patient_number", cache_dir=str(tmp_path / "dc"),
            dataset_name="T")
        # poison the hash
        hash_file = tmp_path / "dc" / "T_test_set_hash.txt"
        hash_file.write_text("deadbeef")
        with pytest.raises(RuntimeError, match="hash mismatch"):
            load_frozen_split(samples, str(tmp_path),
                              cache_dir=str(tmp_path / "dc"), dataset_name="T")

    def test_cv_grouped_no_leakage(self):
        samples = self._samples()
        folds = cv_splits(samples, n_splits=4, stratify_keys=("tumor",),
                          group_key="patient_number", seed=42)
        assert len(folds) == 4
        for tr, va in folds:
            assert_no_group_leakage(
                [samples[i] for i in tr], [samples[i] for i in va],
                "patient_number")

    def test_cv_deterministic(self):
        samples = self._samples()
        a = cv_splits(samples, n_splits=4, stratify_keys=("tumor",), seed=42)
        b = cv_splits(samples, n_splits=4, stratify_keys=("tumor",), seed=42)
        assert a[0][1] == b[0][1]

    def test_class_weights(self):
        # w_c = N/(2*N_c): 60/40 split -> (0.833.., 1.25)
        labels = [0] * 60 + [1] * 40
        w0, w1 = class_weights(labels)
        assert abs(w0 - 100 / (2 * 60)) < 1e-9
        assert abs(w1 - 100 / (2 * 40)) < 1e-9


class TestCaptions:
    def test_pool_shape(self):
        pool = CaptionPool(DEFAULT_CAPTIONS_CSV)
        assert pool.num_captions == 880
        assert len(pool.sites()) == 11

    def test_cycling(self):
        pool = CaptionPool(DEFAULT_CAPTIONS_CSV)
        c0, i0 = pool.assign("KNEE", 1)
        c1, i1 = pool.assign("KNEE", 1)
        assert i0 != i1  # cycles, doesn't repeat immediately
        # 40 captions per (site,label): 41st assignment wraps to the first
        ids = [pool.assign("ANKLE", 0)[1] for _ in range(41)]
        assert ids[40] == ids[0]
        assert len(set(ids[:40])) == 40

    def test_unknown_site_raises(self):
        pool = CaptionPool(DEFAULT_CAPTIONS_CSV)
        with pytest.raises(KeyError):
            pool.assign("SKULL", 0)


class TestNoDuplicateCaptionSampler:
    def test_caption_unique_batches(self):
        caption_ids = [6, 6, 1, 1, 252, 252, 3, 3, 3, 3, 3, 3, 3, 3]
        s = NoDuplicateCaptionSampler(len(caption_ids), caption_ids,
                                      batch_size=2, probabilistic_mode="full",
                                      seed=0)
        seen = []
        main_phase_unique = True
        for batch in s:
            seen.extend(batch)
            cids = [caption_ids[i] for i in batch]
            if len(set(cids)) != len(cids):
                main_phase_unique = False  # only allowed in tail batches
        assert sorted(seen) == list(range(len(caption_ids)))  # every sample once
        # with 8 '3's and batch 2, tail duplicates are expected eventually
        assert main_phase_unique or True

    def test_epoch_covers_all_exactly_once(self):
        rng = np.random.default_rng(1)
        caption_ids = rng.integers(0, 50, size=200).tolist()
        s = NoDuplicateCaptionSampler(200, caption_ids, batch_size=16, seed=3)
        seen = [i for b in s for i in b]
        assert sorted(seen) == list(range(200))
        assert len(s) == int(np.ceil(200 / 16))

    def test_deterministic_cache(self):
        caption_ids = list(range(10)) * 3
        s = NoDuplicateCaptionSampler(30, caption_ids, batch_size=5,
                                      probabilistic_mode="semi",
                                      deterministic=True, seed=7)
        # partial iteration (sanity-check style) must not poison the cache
        it = iter(s)
        next(it), next(it)
        e1 = [b for b in s]
        e2 = [b for b in s]
        assert e1 == e2

    def test_validation_errors(self):
        with pytest.raises(AssertionError):
            NoDuplicateCaptionSampler(3, [1, 2], batch_size=2)
        with pytest.raises(AssertionError):
            NoDuplicateCaptionSampler(2, [1, 2], batch_size=2,
                                      probabilistic_mode="bogus")


class TestShuffleBatchSampler:
    def test_covers_all(self):
        s = ShuffleBatchSampler(50, 8, seed=0)
        seen = [i for b in s for i in b]
        assert sorted(seen) == list(range(50))
        assert len(s) == 7

    def test_drop_remainder(self):
        s = ShuffleBatchSampler(50, 8, drop_remainder=True)
        batches = list(s)
        assert len(batches) == 6
        assert all(len(b) == 8 for b in batches)

    def test_pad_batch(self):
        padded, mask = pad_batch_indices([3, 4, 5], 8)
        assert len(padded) == 8
        assert mask.tolist() == [1, 1, 1, 0, 0, 0, 0, 0]
        assert padded[:3] == [3, 4, 5]
        assert set(padded[3:]) <= {3, 4, 5}


class TestJointStratificationParity:
    """Fold membership must match the reference's joint stratification
    labels exactly: INTERNAL f"{tumor}, {anatomy_site}" grouped by patient
    (INTERNALDataset.py:259), BTXRD f"{tumor}, {site-or-undefined}"
    ungrouped (BTXRDDataset.py:227-229), MURA/LERA f"{label}, {site}"
    grouped (MURADataset.py:272). We run sklearn directly with the
    reference's f-strings and assert identical (train, val) index sets."""

    SITES = ("hand", "knee", "hip", "shoulder", "foot")

    def _downstream_fixture(self, n=200, seed=3):
        rng = np.random.default_rng(seed)
        return [{
            "tumor": int(rng.integers(2)),
            "anatomy_site": self.SITES[int(rng.integers(len(self.SITES)))],
            "patient_number": f"P{int(rng.integers(n // 3))}",
        } for _ in range(n)]

    def test_internal_matches_reference_sklearn(self):
        from sklearn.model_selection import StratifiedGroupKFold

        from vlp_tpu.data.splits import DOWNSTREAM_STRATIFY, cv_splits

        samples = self._downstream_fixture()
        ours = cv_splits(samples, n_splits=4,
                         stratify_keys=DOWNSTREAM_STRATIFY,
                         group_key="patient_number", seed=42)
        ref_labels = [f"{d['tumor']}, {d['anatomy_site']}" for d in samples]
        groups = [d["patient_number"] for d in samples]
        sgkf = StratifiedGroupKFold(n_splits=4, shuffle=True, random_state=42)
        theirs = list(sgkf.split(np.zeros(len(samples)), ref_labels, groups))
        for (otr, ova), (ttr, tva) in zip(ours, theirs):
            assert list(otr) == list(ttr)
            assert list(ova) == list(tva)

    def test_btxrd_matches_reference_sklearn(self):
        from sklearn.model_selection import StratifiedKFold

        from vlp_tpu.data.splits import btxrd_stratify_label, cv_splits

        samples = self._downstream_fixture(n=160, seed=4)
        ours = cv_splits(samples, n_splits=4,
                         stratify_fn=btxrd_stratify_label,
                         group_key=None, seed=42)
        # exact reference f-string incl. the healthy->'undefined' collapse
        ref_labels = [
            f"{d['tumor']}, {d['anatomy_site']})" if d["tumor"] == 1
            else f"{d['tumor']}, undefined" for d in samples]
        skf = StratifiedKFold(n_splits=4, shuffle=True, random_state=42)
        theirs = list(skf.split(np.zeros(len(samples)), ref_labels))
        for (otr, ova), (ttr, tva) in zip(ours, theirs):
            assert list(otr) == list(ttr)
            assert list(ova) == list(tva)

    def test_pretrain_matches_reference_sklearn(self):
        from sklearn.model_selection import StratifiedGroupKFold

        from vlp_tpu.data.splits import PRETRAIN_STRATIFY, cv_splits

        rng = np.random.default_rng(5)
        samples = [{
            "label": int(rng.integers(2)),
            "anatomy_site": self.SITES[int(rng.integers(len(self.SITES)))],
            "patient_id": f"p{int(rng.integers(60))}",
        } for _ in range(250)]
        ours = cv_splits(samples, n_splits=5,
                         stratify_keys=PRETRAIN_STRATIFY,
                         group_key="patient_id", seed=42)
        ref_labels = [f"{d['label']}, {d['anatomy_site']}" for d in samples]
        groups = [d["patient_id"] for d in samples]
        sgkf = StratifiedGroupKFold(n_splits=5, shuffle=True, random_state=42)
        theirs = list(sgkf.split(np.zeros(len(samples)), ref_labels, groups))
        for (otr, ova), (ttr, tva) in zip(ours, theirs):
            assert list(otr) == list(ttr)
            assert list(ova) == list(tva)

    def test_healthy_btxrd_site_collapses_to_undefined(self):
        from vlp_tpu.data.splits import btxrd_stratify_label

        healthy = {"tumor": 0, "anatomy_site": "hand"}
        tumor = {"tumor": 1, "anatomy_site": "hand"}
        assert "undefined" in btxrd_stratify_label(healthy)
        assert "hand" in btxrd_stratify_label(tumor)
