#!/bin/bash
# Round-4 TPU queue A: serving donation A/B (same-day) + stage breakdown.
# One job at a time on the single tunneled chip.
cd /root/repo
LOG=logs/tpu_r4_queue.log
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" > logs/bench_$name.out 2>&1
  echo "rc=$? $(tail -1 logs/bench_$name.out)" >> $LOG
}
run serving_donate --serving --quant
run serving_nodonate --serving --quant --no_donate
run serving_breakdown --serving --quant --serving_breakdown
echo "QUEUE R4A DONE $(date +%H:%M:%S)" >> $LOG
