#!/usr/bin/env bash
# Benchmark harness router. Counterpart of reference benchmark.sh:1-95.
#
#   ./benchmark.sh                 # headline throughput (0.6b)
#   MODEL_SIZE=1.7b ./benchmark.sh
#   ./benchmark.sh chunk_sweep | modes | backends | ttfa | streaming | custom | baseline | all
set -euo pipefail
cd "$(dirname "$0")"

TARGET=${1:-throughput}
export MODEL_SIZE=${MODEL_SIZE:-0.6b}
export QUANT=${QUANT:-Q8_0}

run() { echo "==> benchmarks/$1.py (MODEL_SIZE=$MODEL_SIZE QUANT=$QUANT)"; python "benchmarks/$1.py"; }

case "$TARGET" in
  throughput)  run throughput ;;
  chunk_sweep) run chunk_sweep ;;
  modes)       run compare_modes ;;
  backends)    run backend_compare ;;
  ttfa)        run profile_ttfa ;;
  streaming)   run streaming ;;
  custom)      run custom_voice ;;
  baseline)    run baseline ;;
  headline)    python bench.py --model "$MODEL_SIZE" --quant "$QUANT" ;;
  all)
    for t in throughput chunk_sweep modes backends ttfa streaming custom baseline; do
      "$0" "$t" || echo "!! $t failed"
    done ;;
  *) echo "unknown target: $TARGET"; exit 2 ;;
esac
