#!/bin/bash
# Round-4 TPU queue H: scoped-vmem sweep beyond train (queue F found
# default-vmem train at 566 f/s vs 942.9 with 64 MiB on the fresh VM).
# Now that compiler options ride the serving engine and eval bench paths
# (commit 5859118), A/B the same lever on the other two headline configs,
# re-run k8b16 with it, and bracket the train sweet spot (48/96 MiB).
cd /root/repo
while kill -0 $(cat /tmp/r4g.pid) 2>/dev/null; do sleep 60; done
LOG=logs/tpu_r4_queue.log
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" > logs/bench_$name.out 2>&1
  echo "rc=$? $(tail -1 logs/bench_$name.out)" >> $LOG
}
run serving_vmem64 --serving --quant --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run eval_vmem64 --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run train_k8b16_vmem64 --train --frames 8 --clips 16 --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run train_k2b64_vmem48m --train --clips 64 --xla_opt xla_tpu_scoped_vmem_limit_kib=49152
run train_k2b64_vmem96m --train --clips 64 --xla_opt xla_tpu_scoped_vmem_limit_kib=98304
echo "QUEUE R4H DONE $(date +%H:%M:%S)" >> $LOG
