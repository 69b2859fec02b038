#!/usr/bin/env bash
# Grid launcher — the TPU-host replacement for the reference's SLURM array
# jobs (scripts/triton/vanderpol_gp.slrm: sbatch --array=1-81 running one
# config per CPU task).  On TPU one process runs every chain of a config
# vmapped on-chip, so the grid is a simple sequential (or per-host) loop;
# under SLURM, submit this same command with --id $SLURM_ARRAY_TASK_ID.
#
# Multi-host pods: skip this script and run `... experiments.run
# --json-dir JSON_DIR --id all` once per host — each process takes its
# slice of the grid via parallel/runtime.py (jax.distributed).
#
# Usage: scripts/launch_grid.sh JSON_DIR [FIRST_ID LAST_ID]
set -euo pipefail
JSON_DIR=${1:?usage: launch_grid.sh JSON_DIR [FIRST_ID LAST_ID]}
FIRST=${2:-1}
LAST=${3:-$(ls "$JSON_DIR" | grep -c '\.json$')}

for id in $(seq "$FIRST" "$LAST"); do
  echo "=== config $id / $LAST ==="
  python -m bayesian_ode_tpu.experiments.run --json-dir "$JSON_DIR" --id "$id"
done
