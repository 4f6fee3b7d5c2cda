#!/bin/bash
# Single-chip batch-size scaling: throughput at B=400 / B=1000 chains
# (store_cr=0: sample-write HBM excluded, the compute-core number).
set -u
LOG=${SWEEP_LOG:-/tmp/sweep_megachain4.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" PROF_ITERS=50 PROF_K=50 PROF_REPS=5 PROF_DRIFT=0.6 \
    PROF_WARM_NS=3 PROF_REFINE=1 PROF_BT=8 \
    timeout 2400 python scripts/profile_megachain.py >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run PROF_B=400 PROF_STORE_CR=0
run PROF_B=1000 PROF_STORE_CR=0
echo "SWEEP4 DONE" >> "$LOG"
