#!/bin/bash
# Sequential megachain config sweep on hardware. Each config is a cold
# remote compile (5-20 min) run under timeout so a hung compile cannot
# stall the sweep. Results accumulate in /tmp/sweep_megachain.log.
set -u
LOG=${SWEEP_LOG:-/tmp/sweep_megachain.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" PROF_ITERS=100 PROF_K=100 PROF_REPS=5 \
    timeout 2400 python scripts/profile_megachain.py >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run PROF_WARM_NS=2 PROF_REFINE=1 PROF_BT=8 PROF_INV_PASSES=3
run PROF_WARM_NS=0 PROF_REFINE=2 PROF_BT=8 PROF_INV_PASSES=1
run PROF_WARM_NS=2 PROF_REFINE=2 PROF_BT=8 PROF_INV_PASSES=1
run PROF_WARM_NS=0 PROF_REFINE=1 PROF_BT=16 PROF_INV_PASSES=3
echo "SWEEP DONE" >> "$LOG"
