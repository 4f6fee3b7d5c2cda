#!/bin/bash
# Ablation sweep of the 2.3 ms/iter steady state: HBM-write share
# (store_cr off), NS depth, tile granularity.
set -u
LOG=${SWEEP_LOG:-/tmp/sweep_megachain3.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" PROF_ITERS=100 PROF_K=100 PROF_REPS=5 PROF_DRIFT=0.6 \
    timeout 2400 python scripts/profile_megachain.py >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run PROF_WARM_NS=3 PROF_REFINE=1 PROF_BT=8 PROF_STORE_CR=0
run PROF_WARM_NS=4 PROF_REFINE=1 PROF_BT=8
run PROF_WARM_NS=3 PROF_REFINE=1 PROF_BT=4
echo "SWEEP3 DONE" >> "$LOG"
