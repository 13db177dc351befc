#!/usr/bin/env bash
# Download BAL benchmark problems (ladybug / venice / final families)
# from the Bundle Adjustment in the Large project page, mirroring the
# reference's scripts/download-bal-problems.sh usage:
#   ./scripts/download-bal-problems.sh ladybug-49 venice-89 final-13682
set -euo pipefail

BASE_URL="https://grail.cs.washington.edu/projects/bal"
DATA_DIR="${DATA_DIR:-data/rootba/bal}"

declare -A FAMILY=(
  [ladybug-49]="ladybug/problem-49-7776-pre.txt.bz2"
  [ladybug-1723]="ladybug/problem-1723-156502-pre.txt.bz2"
  [venice-89]="venice/problem-89-110973-pre.txt.bz2"
  [venice-1778]="venice/problem-1778-993923-pre.txt.bz2"
  [final-93]="final/problem-93-61203-pre.txt.bz2"
  [final-13682]="final/problem-13682-4456117-pre.txt.bz2"
)

for name in "$@"; do
  rel="${FAMILY[$name]:-}"
  if [[ -z "$rel" ]]; then
    echo "unknown problem '$name'; known: ${!FAMILY[*]}" >&2
    exit 1
  fi
  dir="$DATA_DIR/$(dirname "$rel")"
  mkdir -p "$dir"
  out="$dir/$(basename "$rel")"
  if [[ -f "${out%.bz2}" ]]; then
    echo "already have ${out%.bz2}"
    continue
  fi
  echo "fetching $BASE_URL/data/$rel"
  curl -fL "$BASE_URL/data/$rel" -o "$out"
  bunzip2 "$out"
done
