#!/bin/bash
# Round-4 TPU queue B: train donation A/B + scoped-vmem probe at the k2b64
# sweet spot, then the BERT lock training run + BERT eval bench.
cd /root/repo
LOG=logs/tpu_r4_queue.log
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" >> $LOG
  python bench.py "$@" > logs/bench_$name.out 2>&1
  echo "rc=$? $(tail -1 logs/bench_$name.out)" >> $LOG
}
run train_k2b64_donate --train --clips 64
run train_k2b64_nodonate --train --clips 64 --no_donate
echo "=== train_k2b64_vmem64m (scoped vmem 64M) $(date +%H:%M:%S)" >> $LOG
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
  python bench.py --train --clips 64 > logs/bench_train_k2b64_vmem64m.out 2>&1
echo "rc=$? $(tail -1 logs/bench_train_k2b64_vmem64m.out)" >> $LOG
run bert_eval --bert_eval
echo "=== make_converge32 --bert $(date +%H:%M:%S)" >> $LOG
python tools/make_converge32.py --bert > logs/make_converge32bert.out 2>&1
echo "rc=$? $(tail -3 logs/make_converge32bert.out | head -1)" >> $LOG
echo "QUEUE R4B DONE $(date +%H:%M:%S)" >> $LOG
