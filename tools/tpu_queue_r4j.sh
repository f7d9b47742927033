#!/bin/bash
# Round-4 TPU queue J: batched-reference co-attention + int8 QK logits
# A/Bs (commit a169aff), chained after queue I. Eval controls: the
# same-day default runs in queues G/I; serving controls: queue I's
# adjacent pair. Hypotheses: (a) one dot_general with 4x the N dim beats
# 4 sequential Pallas launches on the 80-stream serving trunk (corr is
# ~half the 15.6 ms trunk); (b) int8 QK at 2x MXU peak stacks on top.
cd /root/repo
while kill -0 $(cat /tmp/r4i.pid) 2>/dev/null; do sleep 60; done
LOG=logs/tpu_r4_queue.log
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" > logs/bench_$name.out 2>&1
  echo "rc=$? $(tail -1 logs/bench_$name.out)" >> $LOG
}
run eval_batchrefs --coattn_batch_refs
run eval_batchrefs_int8 --coattn_batch_refs --coattn_int8
run eval_int8only --coattn_int8
run serving_batchrefs --serving --quant --coattn_batch_refs
run serving_batchrefs_int8 --serving --quant --coattn_batch_refs --coattn_int8
echo "QUEUE R4J DONE $(date +%H:%M:%S)" >> $LOG
