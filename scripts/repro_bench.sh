#!/usr/bin/env bash
# Regenerate every per-mode bench artifact for a round, on the TPU host.
#
# Usage:  scripts/repro_bench.sh [round]        (default: 04)
#
# Each BENCH_r{N}_{mode}.json is exactly the one JSON line bench.py
# prints on stdout for that mode (accuracy fields — int8 agreement,
# hybrid prob/std err — ride inside the same line). The driver produces
# the headline BENCH_r{N}.json itself from plain `python bench.py`;
# this script regenerates the rest so every number in README's perf
# table stays a re-runnable artifact (VERDICT r3 item 6).
#
# Serialize on this host: one CPU core, so never run two of these
# concurrently (each full-geometry compile takes 5-20 min cold; the
# persistent .jax_cache makes re-runs fast).
set -euo pipefail
cd "$(dirname "$0")/.."
R="${1:-04}"

run() { # run <outfile> <args...>
  local out="$1"; shift
  echo ">> bench.py $* -> $out" >&2
  python bench.py "$@" > "$out"
  cat "$out"
}

run "BENCH_r${R}_int8.json"          --int8
run "BENCH_r${R}_tta_mc.json"        --mode tta_mc --batch 32
run "BENCH_r${R}_tta_mc_hybrid.json" --mode tta_mc --batch 32 --int8-prefix
run "BENCH_r${R}_train.json"         --train --batch 32
run "BENCH_r${R}_folds.json"         --train --parallel-folds 2
