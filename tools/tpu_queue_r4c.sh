#!/bin/bash
# Round-4 TPU queue C: regenerate the LSTM accuracy lock (wiped with the
# workspace) + the scoped-vmem flag sweep at the k2b64 sweet spot.
# XLA_FLAGS is rejected client-side on axon; the vmem knob rides PJRT
# compiler_options via bench.py --xla_opt instead.
cd /root/repo
LOG=logs/tpu_r4_queue.log
echo "=== make_converge32 (LSTM lock) $(date +%H:%M:%S)" >> $LOG
python tools/make_converge32.py > logs/make_converge32.out 2>&1
echo "rc=$? $(tail -3 logs/make_converge32.out | head -1)" >> $LOG
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" > logs/bench_$name.out 2>&1
  echo "rc=$? $(tail -1 logs/bench_$name.out)" >> $LOG
}
run train_k2b64_vmem64m --train --clips 64 --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run train_k2b64_vmem128m --train --clips 64 --xla_opt xla_tpu_scoped_vmem_limit_kib=131072
echo "QUEUE R4C DONE $(date +%H:%M:%S)" >> $LOG
