#!/bin/bash
# Round-4 TPU queue F (fresh VM, replaces the interrupted E): A/Bs for
# commit 5aa3a2d FIRST (rotating rings + single-direction fused
# co-attention landed unmeasured), then the scoped-vmem train sweep
# (VERDICT r3 #7, via --xla_opt / PJRT compiler_options), then both
# accuracy locks (wiped with the workspace; make_converge32 resumes).
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
run train_k2b64_base --train --clips 64
run train_k2b64_vmem64m --train --clips 64 --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run train_k2b64_vmem128m --train --clips 64 --xla_opt xla_tpu_scoped_vmem_limit_kib=131072
run train_k8b16_r4new --train --frames 8 --clips 16
echo "=== make_converge32 (LSTM lock) $(date +%H:%M:%S)" >> $LOG
python tools/make_converge32.py > logs/make_converge32.out 2>&1
echo "rc=$? $(tail -3 logs/make_converge32.out | head -1)" >> $LOG
echo "=== make_converge32 --bert $(date +%H:%M:%S)" >> $LOG
python tools/make_converge32.py --bert > logs/make_converge32bert.out 2>&1
echo "rc=$? $(tail -3 logs/make_converge32bert.out | head -1)" >> $LOG
echo "QUEUE R4F DONE $(date +%H:%M:%S)" >> $LOG
