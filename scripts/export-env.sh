#!/usr/bin/env bash
# Export the exact Python environment for reproducibility
# (reference scripts/export-conda-env.sh parity; pip-based here — the TPU
# image is pip-managed, not conda).
#
# Writes:
#   environment.lock.txt  — `pip freeze` of the current interpreter
#   environment.meta.txt  — python/jax/libtpu versions + platform
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pip freeze --all > environment.lock.txt
{
  echo "generated: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  python - <<'PY'
import platform
import sys

print(f"python: {sys.version.split()[0]} ({platform.platform()})")
for mod in ("jax", "jaxlib", "flax", "optax", "orbax.checkpoint", "numpy"):
    try:
        m = __import__(mod)
        print(f"{mod}: {getattr(m, '__version__', 'unknown')}")
    except ImportError:
        print(f"{mod}: not installed")
PY
} > environment.meta.txt
echo "wrote environment.lock.txt + environment.meta.txt"
