#!/usr/bin/env bash
# Sweep launch wrapper — the analogue of the reference's
# scripts/create_sweep_from_config.sh + slurm/train_sweep.sh agent flow.
# Usage: SWEEP=configs/sweeps/baseline/from_scratch/resnet_34_baseline.yaml COUNT=20 ./scripts/launch_sweep.sh
set -euo pipefail
cd "$(dirname "$0")/.."

: "${SWEEP:?set SWEEP=<path to sweep yaml>}"
COUNT="${COUNT:-10}"

exec python -m vlp_tpu.train.sweep "$SWEEP" --trials "$COUNT" \
  --output-dir "outputs/sweep_$(basename "$SWEEP" .yaml)"
