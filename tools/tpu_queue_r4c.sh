#!/bin/bash
# Round-4 TPU queue C: regenerate the LSTM accuracy lock (wiped with the
# workspace) + the second scoped-vmem point for the train flag sweep.
cd /root/repo
LOG=logs/tpu_r4_queue.log
echo "=== make_converge32 (LSTM lock) $(date +%H:%M:%S)" >> $LOG
python tools/make_converge32.py > logs/make_converge32.out 2>&1
echo "rc=$? $(tail -3 logs/make_converge32.out | head -1)" >> $LOG
echo "=== train_k2b64_vmem128m (scoped vmem 128M) $(date +%H:%M:%S)" >> $LOG
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=131072" \
  python bench.py --train --clips 64 > logs/bench_train_k2b64_vmem128m.out 2>&1
echo "rc=$? $(tail -1 logs/bench_train_k2b64_vmem128m.out)" >> $LOG
echo "QUEUE R4C DONE $(date +%H:%M:%S)" >> $LOG
