#!/bin/bash
# Round-4 TPU queue K: ceiling probes after the trunk-cut round, chained
# after queue J.
# - eval b80/b96: the batch sweet spot has moved up every time the
#   activation footprint shrank (16->32->64); int8 chain + split corr +
#   single-direction co-attention shrank it again. b128 OOM'd round 3.
# - serving 100/120 streams: saturation was measured at 80 with SHIFT
#   rings (round 3); rotating rings cut per-tick ring traffic ~5x, so
#   the saturation point may have moved. 160 was negative round 3.
# - train k4b32: same 128-frame step as k2b64/k8b16 but the untested
#   middle clip length; 64 MiB scoped VMEM (the k2b64 lever, queue F)
#   A/B'd against default.
cd /root/repo
while kill -0 $(cat /tmp/r4j.pid) 2>/dev/null; do sleep 60; done
LOG=logs/tpu_r4_queue.log
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" > logs/bench_$name.out 2>&1
  echo "rc=$? $(tail -1 logs/bench_$name.out)" >> $LOG
}
run eval_b80 --clips 80
run eval_b96 --clips 96
run serving_s100 --serving --quant --clips 20
run serving_s120 --serving --quant --clips 24
run train_k4b32_vmem64 --train --frames 4 --clips 32 --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run train_k4b32_default --train --frames 4 --clips 32
echo "QUEUE R4K DONE $(date +%H:%M:%S)" >> $LOG
