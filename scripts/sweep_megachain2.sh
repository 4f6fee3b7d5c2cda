#!/bin/bash
# Warm-start sweep: NS-refresh of the VMEM-carried inverse with the
# NaN-safe gate and drift_max sized by scripts/probe_ns_drift.py
# (gate passes 100% at 0.5 with worst NS seed delta = 0.26).
set -u
LOG=${SWEEP_LOG:-/tmp/sweep_megachain2.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" PROF_ITERS=100 PROF_K=100 PROF_REPS=5 \
    timeout 2400 python scripts/profile_megachain.py >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run PROF_WARM_NS=2 PROF_DRIFT=0.6 PROF_REFINE=1 PROF_BT=8 PROF_INV_PASSES=3
run PROF_WARM_NS=3 PROF_DRIFT=0.6 PROF_REFINE=1 PROF_BT=8 PROF_INV_PASSES=3
echo "SWEEP2 DONE" >> "$LOG"
