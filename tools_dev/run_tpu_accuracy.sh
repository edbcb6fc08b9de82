#!/bin/bash
# Run the on-chip bf16/Pallas accuracy suite and record the per-round
# artifact (round-3 VERDICT ask #7): TPU_ACCURACY_r{N}.txt proves the
# hardware-only paths still hold this round.
#
# Usage: tools_dev/run_tpu_accuracy.sh r04
# ONE TPU process at a time — do not run concurrently with bench/profiling.
set -u
cd "$(dirname "$0")/.."
out="TPU_ACCURACY_${1:-latest}.txt"
{
  echo "# on-chip accuracy suite @ $(git rev-parse --short HEAD) $(date -u +%FT%TZ)"
  VIBA_TEST_BACKEND=tpu PYTHONPATH=/root/.axon_site:/root/repo \
    timeout 5400 python -m pytest tests/test_tpu_accuracy.py -m tpu -v 2>&1 \
    | grep -v "WARNING:"
  # capacity-shape compile probe (round-4 VERDICT ask #8): the full one-jit
  # LM iteration must compile AND run at the reference's PCG-switch scale
  # (>20k rigs, Settings.cpp:296-320) — the scale BENCH_r04 compile-OOM'd at
  echo "# capacity compile probe (21.6k rigs)"
  PYTHONPATH=/root/.axon_site:/root/repo \
    timeout 1500 python -u tools_dev/capacity_compile_probe.py 2>&1 \
    | grep -v "WARNING:"
} > "$out"
tail -4 "$out"
