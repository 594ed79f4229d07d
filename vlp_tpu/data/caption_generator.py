"""Offline caption-pool generator.

The reference generates its caption pool (res/data/pretrain/captions.csv:
11 MURA/LERA sites x 2 labels x ~40 captions) with Llama-3.1-8B-Instruct via
the HF pipeline (reference src/data/helpers/caption_generator.py:7-88). This
environment has no model weights or egress, so the equivalent here is a
deterministic compositional template generator producing the same CSV schema
(anatomy_site, abnormality_label, caption) with the same pool sizes. If an
LLM is available, ``generate_with_llm`` uses it instead (same prompt shape:
JSON lists of <=3-sentence captions per (site, label)).
"""
from __future__ import annotations

import itertools
import os
from typing import List, Optional

import pandas as pd

SITES = (
    "ANKLE", "ELBOW", "FINGER", "FOOT", "FOREARM", "HAND", "HIP",
    "HUMERUS", "KNEE", "SHOULDER", "WRIST",
)

_OPENERS = (
    "A radiograph of {art} {site}",
    "An x-ray image of {art} {site}",
    "Radiographic image of {art} {site}",
    "A plain film of {art} {site}",
    "An {site} x-ray",
    "A musculoskeletal radiograph of the {site}",
    "A diagnostic x-ray of the {site}",
    "A frontal radiograph of the {site}",
)

_NORMAL_FINDINGS = (
    "showing no signs of an abnormality.",
    "with no abnormal findings.",
    "with a normal appearance.",
    "demonstrating intact cortical margins and normal alignment.",
    "with preserved joint spaces and no acute osseous abnormality.",
    "showing normal bone density and trabecular pattern.",
    "without fracture, dislocation, or focal lesion.",
    "read as unremarkable by the interpreting radiologist.",
)

_ABNORMAL_FINDINGS = (
    "showing an abnormal finding.",
    "demonstrating a radiographic abnormality.",
    "with findings suspicious for pathology.",
    "showing cortical irregularity concerning for an osseous lesion.",
    "demonstrating abnormal bone texture and possible periosteal reaction.",
    "with an area of lucency that warrants further evaluation.",
    "showing degenerative or destructive osseous changes.",
    "flagged as abnormal on radiologic review.",
)


def _article(site: str) -> str:
    return "an" if site[0].lower() in "aeiou" else "a"


def generate_captions(per_combination: int = 40,
                      sites: Optional[List[str]] = None) -> pd.DataFrame:
    """Deterministic pool: per (site, label), cycle opener x finding
    combinations; 8 x 8 = 64 distinct combos cover per_combination=40."""
    rows = []
    for site in sites or SITES:
        site_l = site.lower()
        for label, findings in ((0, _NORMAL_FINDINGS), (1, _ABNORMAL_FINDINGS)):
            combos = list(itertools.product(_OPENERS, findings))
            # interleave so neighbouring captions differ in both parts
            combos = combos[::3] + combos[1::3] + combos[2::3]
            seen = set()
            for opener, finding in combos:
                caption = f"{opener.format(art=_article(site_l), site=site_l)} {finding}"
                caption = caption[0].upper() + caption[1:]
                if caption in seen:
                    continue
                seen.add(caption)
                rows.append({"anatomy_site": site, "abnormality_label": label,
                             "caption": caption})
                if len([r for r in rows
                        if r["anatomy_site"] == site
                        and r["abnormality_label"] == label]) >= per_combination:
                    break
    return pd.DataFrame(rows)


def generate_with_llm(model_name: str = "meta-llama/Llama-3.1-8B-Instruct",
                      per_combination: int = 40) -> pd.DataFrame:  # pragma: no cover
    """LLM-backed variant matching the reference's approach; requires local
    weights. Falls back to templates on any failure."""
    try:
        import json

        from transformers import pipeline

        pipe = pipeline("text-generation", model=model_name)
        rows = []
        for site in SITES:
            for label in (0, 1):
                kind = "no abnormality" if label == 0 else "an abnormality"
                prompt = (
                    f"Generate a JSON list of {per_combination} distinct captions, "
                    f"each at most 3 sentences, describing an x-ray of a {site.lower()} "
                    f"showing {kind}. Output only the JSON list."
                )
                out = pipe(prompt, max_new_tokens=2048)[0]["generated_text"]
                captions = json.loads(out[out.index("[") : out.rindex("]") + 1])
                for c in captions[:per_combination]:
                    rows.append({"anatomy_site": site,
                                 "abnormality_label": label, "caption": str(c)})
        return pd.DataFrame(rows)
    except Exception:
        return generate_captions(per_combination)


def fill_missing(csv_path: str, per_combination: int = 40) -> int:
    """Regenerate only missing (site,label) combinations in an existing
    caption CSV (the reference's caption_regenerate_missing.py:8-41).
    Returns the number of rows appended."""
    df = pd.read_csv(csv_path)
    have = {(str(r["anatomy_site"]), int(r["abnormality_label"]))
            for _, r in df.iterrows()}
    counts = df.groupby(["anatomy_site", "abnormality_label"]).size().to_dict()
    added = []
    full = generate_captions(per_combination)
    for site in SITES:
        for label in (0, 1):
            n_have = counts.get((site, label), 0)
            if (site, label) not in have or n_have < per_combination:
                pool = full[(full["anatomy_site"] == site)
                            & (full["abnormality_label"] == label)]
                existing = set(df[(df["anatomy_site"] == site)
                                  & (df["abnormality_label"] == label)]["caption"])
                for _, row in pool.iterrows():
                    if len(existing) >= per_combination:
                        break
                    if row["caption"] not in existing:
                        added.append(row)
                        existing.add(row["caption"])
    if added:
        out = pd.concat([df, pd.DataFrame(added)], ignore_index=True)
        out.to_csv(csv_path, index=False)
    return len(added)


def main(out_path: str = "res/data/pretrain/captions.csv",
         per_combination: int = 40) -> str:
    df = generate_captions(per_combination)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    df.to_csv(out_path, index=False)
    return out_path


if __name__ == "__main__":
    import sys

    path = main(*sys.argv[1:2])
    print(f"wrote {path}")
