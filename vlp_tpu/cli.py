"""Console entry points (populated as the trainer/eval layers land)."""
from __future__ import annotations

import sys


def train_main(argv=None) -> int:
    from vlp_tpu.train.driver import main

    return main(argv if argv is not None else sys.argv[1:])


def test_eval_main(argv=None) -> int:
    from vlp_tpu.eval.test_eval import main

    return main(argv if argv is not None else sys.argv[1:])
