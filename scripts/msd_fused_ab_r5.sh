#!/bin/bash
# Composed fused-MSD A/B on the real chip (VERDICT r4 item 1).
# Six back-to-back bench_train_step runs at b64; quiet-tunnel discipline:
# one TPU job at a time, sequential, results appended to one log.
cd /root/repo
LOG=artifacts/msd_fused_ab_r5.log
: > "$LOG"
run() {
  echo "=== RUN: $* ===" >> "$LOG"
  timeout 1800 python scripts/bench_train_step.py "$@" >> "$LOG" 2>&1
  echo "--- exit: $? ---" >> "$LOG"
}
run 64
run 64 --msd_fused
run 64 --disc_bf16
run 64 --disc_bf16 --msd_fused
run 64 --disc_bf16 --trunk_bf16
run 64 --disc_bf16 --trunk_bf16 --msd_fused
echo "=== ALL DONE ===" >> "$LOG"
