#!/bin/bash
# Round-4 TPU queue I: adjacent-pair split-corr serving A/B + the new
# corr/fusion serving breakdown (commit aa95792), chained after queue H.
# Motivation: queue G measured serving WITH split at 2,653.6 pred/s
# (7.8% spread) vs the 10:58 no-split control 2,942.5 — but those runs
# were 2.7 h apart. This queue measures the pair back-to-back so the
# split effect on serving is decidable, then times corr vs fusion/heads
# separately via DCNet.corr_features.
cd /root/repo
while kill -0 $(cat /tmp/r4h.pid) 2>/dev/null; do sleep 60; done
LOG=logs/tpu_r4_queue.log
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" > logs/bench_$name.out 2>&1
  echo "rc=$? $(tail -1 logs/bench_$name.out)" >> $LOG
}
run serving_split_pairA --serving --quant
run serving_nosplit_pairB --serving --quant --no_split_corr
run serving_breakdown_corr --serving --quant --serving_breakdown
echo "QUEUE R4I DONE $(date +%H:%M:%S)" >> $LOG
