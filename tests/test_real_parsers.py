"""End-to-end tests of the REAL dataset parsers over filesystem fixtures
shaped exactly like the corpora (CSV fallback for the xlsx tables — this
image has no Excel engine). Covers parsing, taxonomy mapping, frozen-split
loading + hash verification, caption cycling, and CV grouping."""
import os

import numpy as np
import pandas as pd
import pytest

from vlp_tpu.data.captions import DEFAULT_CAPTIONS_CSV, CaptionPool
from vlp_tpu.data.datasets import (
    BTXRDDataset,
    InternalDataset,
    LERADataset,
    MURADataset,
    read_table,
)
from vlp_tpu.data.splits import create_frozen_split


# ---------------------------------------------------------------- fixtures

def _make_internal(root):
    os.makedirs(root / "initial_images", exist_ok=True)
    rows = []
    sites = ["Clavicula", "Manus", "Pes", "Femur", "Tibia", "Humerus"]
    for i in range(12):
        rows.append({
            "image": f"t{i}.png", "pat_nr": f"P{i // 2}",
            "sex": "W" if i % 2 == 0 else "M",
            "age_initialdiagnosis": 20 + i,
            "anatomy_site": sites[i % len(sites)],
            "entity": "osteochondroma",
        })
    pd.DataFrame(rows).to_csv(root / "included_patients.csv", index=False)
    healthy = [{
        "file": str(root / "initial_images" / f"h{i}.png"),
        "patient_id": f"H{i // 2}", "sex": "F" if i % 2 else "M",
        "age": 30 + i, "anatomy_site": "knee",
    } for i in range(8)]
    pd.DataFrame(healthy).to_csv(root / "healthy_subset_new_cleaned.csv",
                                 index=False)
    # frozen split over the parsed sample paths
    paths = ([str(root / "initial_images" / r["image"]) for r in rows]
             + [h["file"] for h in healthy])
    samples = [{"image_path": p,
                "tumor": 1 if i < len(rows) else 0,
                "patient_number": (rows[i]["pat_nr"] if i < len(rows)
                                   else healthy[i - len(rows)]["patient_id"])}
               for i, p in enumerate(paths)]
    create_frozen_split(samples, str(root), stratify_keys=("tumor",),
                        group_key="patient_number",
                        cache_dir=str(root / "dc"), dataset_name="INTERNAL")
    return root


def _make_btxrd(root):
    os.makedirs(root / "images", exist_ok=True)
    rows = []
    for i in range(12):
        row = {"image_id": f"b{i}.jpg", "tumor": i % 2,
               "gender": "F" if i % 2 else "M", "age": 15 + i}
        for site in ("hand", "ulna", "radius", "humerus", "foot", "tibia",
                     "fibula", "femur", "hip bone", "ankle-joint",
                     "knee-joint", "hip-joint", "wrist-joint", "elbow-joint",
                     "shoulder-joint"):
            row[site] = 0
        for t in ("osteochondroma", "multiple osteochondromas",
                  "simple bone cyst", "giant cell tumor", "osteofibroma",
                  "synovial osteochondroma", "other bt", "osteosarcoma",
                  "other mt"):
            row[t] = 0
        if row["tumor"]:
            row["femur"] = 1  # -> "upper leg"
            row["osteosarcoma"] = 1
        rows.append(row)
    pd.DataFrame(rows).to_csv(root / "dataset.csv", index=False)
    healthy_sites = [{"image_file": r["image_id"], "choice": "KNEE"}
                     for r in rows if r["tumor"] == 0]
    pd.DataFrame(healthy_sites).to_csv(
        root / "BTXRD_healthy_anatomy_sites.csv", index=False)
    samples = [{"image_path": str(root / "images" / r["image_id"]),
                "tumor": r["tumor"]} for r in rows]
    create_frozen_split(samples, str(root), stratify_keys=("tumor",),
                        cache_dir=str(root / "dc"), dataset_name="BTXRD")
    return root


def _make_mura(root):
    rows_img, rows_lbl = [], []
    for p in range(6):
        for s in (1, 2):
            study = f"MURA-v1.1/train/XR_WRIST/patient{p:05d}/study{s}_positive/"
            rows_lbl.append({"study_path": study, "label": p % 2})
            for im in range(2):
                rows_img.append(study + f"image{im + 1}.png")
    pd.DataFrame(rows_lbl).to_csv(root / "train_labeled_studies.csv",
                                  index=False, header=False)
    pd.DataFrame({"p": rows_img}).to_csv(root / "train_image_paths.csv",
                                         index=False, header=False)
    # valid (test) split
    vl, vi = [], []
    for p in (90, 91):
        study = f"MURA-v1.1/valid/XR_ELBOW/patient{p:05d}/study1_negative/"
        vl.append({"study_path": study, "label": 0})
        vi.append(study + "image1.png")
    pd.DataFrame(vl).to_csv(root / "valid_labeled_studies.csv", index=False,
                            header=False)
    pd.DataFrame({"p": vi}).to_csv(root / "valid_image_paths.csv",
                                   index=False, header=False)
    return root


def _make_lera(root):
    labels = []
    for c in range(8):
        case = f"case{c:03d}"
        os.makedirs(root / case / "ST-1", exist_ok=True)
        for i in range(2):
            (root / case / "ST-1" / f"im{i}.png").touch()
        labels.append({"case_number": case, "anatomy_site": "XR HIP",
                       "label": c % 2})
    pd.DataFrame(labels).to_csv(root / "labels.csv", index=False)
    return root


# ------------------------------------------------------------------- tests

class TestReadTable:
    def test_csv_fallback(self, tmp_path):
        pd.DataFrame({"a": [1, 2]}).to_csv(tmp_path / "t.csv", index=False)
        df = read_table(str(tmp_path / "t.xlsx"))
        assert list(df["a"]) == [1, 2]

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_table(str(tmp_path / "nope.xlsx"))


class TestInternalParser:
    def test_parse_and_split(self, tmp_path):
        root = _make_internal(tmp_path)
        ds = InternalDataset(path=str(root), cache_dir=str(root / "dc"))
        all_samples = ds.train_val + ds.test
        assert len(all_samples) == 20
        tumors = [s for s in all_samples if s["tumor"] == 1]
        assert len(tumors) == 12
        # German W -> F and taxonomy applied
        assert {s["sex"] for s in all_samples} <= {"F", "M"}
        assert "shoulder" in {s["anatomy_site"] for s in tumors}  # Clavicula
        assert all(s["clinical"].shape == (15,) for s in all_samples)
        # grouped CV has no patient leakage
        folds = ds.cv_folds(n_splits=3)
        for tr, va in folds:
            groups_tr = {ds.train_val[i]["patient_number"] for i in tr}
            groups_va = {ds.train_val[i]["patient_number"] for i in va}
            assert not groups_tr & groups_va

    def test_hash_tamper_detected(self, tmp_path):
        root = _make_internal(tmp_path)
        (root / "dc" / "INTERNAL_test_set_hash.txt").write_text("bad")
        with pytest.raises(RuntimeError, match="hash mismatch"):
            InternalDataset(path=str(root), cache_dir=str(root / "dc"))


class TestBTXRDParser:
    def test_parse_sites_and_entities(self, tmp_path):
        root = _make_btxrd(tmp_path)
        ds = BTXRDDataset(path=str(root),
                          healthy_sites_xlsx=str(
                              root / "BTXRD_healthy_anatomy_sites.xlsx"),
                          cache_dir=str(root / "dc"))
        all_samples = ds.train_val + ds.test
        assert len(all_samples) == 12
        tumors = [s for s in all_samples if s["tumor"] == 1]
        assert all(s["anatomy_site"] == "upper leg" for s in tumors)  # femur
        assert all(s["entity"] == "osteosarcoma" for s in tumors)
        healthy = [s for s in all_samples if s["tumor"] == 0]
        assert all(s["anatomy_site"] == "knee" for s in healthy)  # lower-cased


class TestMURAParser:
    def test_parse_captions_and_split(self, tmp_path):
        root = _make_mura(tmp_path)
        pool = CaptionPool(DEFAULT_CAPTIONS_CSV)
        ds = MURADataset(pool, path=str(root), cache_dir=str(tmp_path / "dc"))
        assert len(ds.train_val) == 24  # 6 patients x 2 studies x 2 images
        assert len(ds.test) == 2  # official valid split is the test set
        s = ds.train_val[0]
        assert s["anatomy_site"] == "WRIST"
        assert s["image_path"].startswith(str(root))
        assert "MURA-v1.1" not in s["image_path"].removeprefix(str(root))
        # caption cycling: consecutive same-(site,label) samples differ
        same = [x for x in ds.train_val
                if x["label"] == s["label"]][:2]
        assert same[0]["caption_id"] != same[1]["caption_id"]
        # hash file was created and re-init verifies it
        ds2 = MURADataset(pool, path=str(root), cache_dir=str(tmp_path / "dc"))
        assert len(ds2.test) == 2

    def test_grouped_cv(self, tmp_path):
        root = _make_mura(tmp_path)
        ds = MURADataset(CaptionPool(DEFAULT_CAPTIONS_CSV), path=str(root),
                         cache_dir=str(tmp_path / "dc"))
        for tr, va in ds.cv_folds(n_splits=3):
            p_tr = {ds.train_val[i]["patient_id"] for i in tr}
            p_va = {ds.train_val[i]["patient_id"] for i in va}
            assert not p_tr & p_va


class TestLERAParser:
    def test_walk_and_split(self, tmp_path):
        root = _make_lera(tmp_path)
        # build the index + frozen split on first parse
        pool = CaptionPool(DEFAULT_CAPTIONS_CSV)
        # LERA requires a frozen split file; create it from a pre-parse
        import vlp_tpu.data.datasets as D

        df = LERADataset._build_index.__get__(
            type("X", (), {"path": str(root)})())()
        samples = [{"image_path": str(r["image_path"]), "label": r["label"],
                    "case_number": r["case_number"]}
                   for _, r in df.iterrows()]
        create_frozen_split(samples, str(root), stratify_keys=("label",),
                            group_key="case_number",
                            cache_dir=str(root / "dc"), dataset_name="LERA")
        ds = LERADataset(pool, path=str(root), cache_dir=str(root / "dc"))
        all_samples = ds.train_val + ds.test
        assert len(all_samples) == 16
        assert all(s["anatomy_site"] == "HIP" for s in all_samples)  # XR strip
        assert all("caption" in s for s in all_samples)
