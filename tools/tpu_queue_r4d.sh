#!/bin/bash
# Round-4 TPU queue D: A/Bs for the center-only fused co-attention +
# rotating serving rings (landed mid-round: commit 5aa3a2d).
cd /root/repo
LOG=logs/tpu_r4_queue.log
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" > logs/bench_$name.out 2>&1
  echo "rc=$? $(tail -1 logs/bench_$name.out)" >> $LOG
}
run serving_r4new --serving --quant
run serving_r4new_shiftrings --serving --quant --shift_rings
run eval_r4new
run serving_breakdown_r4new --serving --quant --serving_breakdown
run train_k8b16_r4new --train --frames 8 --clips 16
echo "QUEUE R4D DONE $(date +%H:%M:%S)" >> $LOG
