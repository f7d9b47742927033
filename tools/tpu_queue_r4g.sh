#!/bin/bash
# Round-4 TPU queue G: split-corr_conv A/Bs (commit 540d0c2), chained
# after queue F. Counterparts measured same-day in F: eval_r4new ran WITH
# the split (imported post-edit code); serving_r4new ran WITHOUT it
# (imported at 10:58, pre-edit).
cd /root/repo
while kill -0 $(cat /tmp/r4f.pid) 2>/dev/null; do sleep 60; done
LOG=logs/tpu_r4_queue.log
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" > logs/bench_$name.out 2>&1
  echo "rc=$? $(tail -1 logs/bench_$name.out)" >> $LOG
}
run eval_nosplit --no_split_corr
run serving_split --serving --quant
run serving_breakdown_split --serving --quant --serving_breakdown
echo "QUEUE R4G DONE $(date +%H:%M:%S)" >> $LOG
