#!/usr/bin/env bash
# TPU-VM launch wrapper — the analogue of the reference's SLURM sbatch
# scripts (reference slurm/train.sh: EXPERIMENT env var selects the config).
# Usage: EXPERIMENT=baseline_only_imaging_resnet34 ./scripts/launch_train.sh [extra overrides]
set -euo pipefail
cd "$(dirname "$0")/.."

: "${EXPERIMENT:?set EXPERIMENT=<registered experiment name>}"

for var in INTERNAL_DATASET_PATH BTXRD_DATASET_PATH MURA_DATASET_PATH LERA_DATASET_PATH; do
  if [ -z "${!var:-}" ]; then
    echo "WARNING: $var is not set (required for real-data experiments)" >&2
  fi
done

exec python train.py "experiment=${EXPERIMENT}" "$@"
