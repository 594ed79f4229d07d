#!/usr/bin/env python
"""CLI entry: ``python train.py experiment=<name> [dotted.overrides=...]``
— the analogue of the reference's ``python src/train.py experiment=...``
(reference src/train.py:329-338) with hydra-style overrides."""
import os
import sys

# Persistent compile cache (single-core host: compiles dominate cold starts).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from vlp_tpu.train.driver import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
