#!/usr/bin/env bash
# Fan a batch of solver configs out as independent SLURM jobs — the
# reference's scripts/run-all-in.sh + slurm-list-jobs.sh model: each
# rootba_config_*.toml under the given folder becomes one sbatch job
# running scripts/run_batch.py on just that config (runs are fully
# independent; no inter-job communication, matching the reference's
# cluster usage where SLURM only multiplexes single-node solves).
#
# Usage: scripts/slurm-run-all.sh <folder> [sbatch args...]
set -euo pipefail
folder=${1:?usage: slurm-run-all.sh <folder> [sbatch args...]}
shift || true
repo=$(cd "$(dirname "$0")/.." && pwd)
for cfg in "$folder"/rootba_config_*.toml; do
    [ -e "$cfg" ] || { echo "no rootba_config_*.toml in $folder"; exit 1; }
    name=$(basename "$cfg" .toml)
    sbatch "$@" --job-name "povar-$name" --wrap \
        "cd $repo && python scripts/run_batch.py --only '$cfg' '$folder'"
done

# list jobs (slurm-list-jobs.sh equivalent): squeue -u $USER -o '%j %T %M'
