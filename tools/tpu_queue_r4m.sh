#!/bin/bash
# Round-4 queue M: fresh-VM rerun of queues H/I/J/K, whose results were
# lost when the VM (and gitignored logs/) was recycled before they were
# recorded. Priority-ordered: decision-relevant A/Bs first, ceiling
# probes last. Raw one-line results append to BENCH_RAW_r4.md (COMMITTED,
# unlike logs/) so partial progress survives another recycle.
cd /root/repo
LOG=logs/tpu_r4m.log
RAW=BENCH_RAW_r4.md
mkdir -p logs
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" >> $LOG
  echo "=== $name: $* $(date +%H:%M:%S)" >> $RAW
  timeout 3600 python bench.py "$@" > logs/bench_$name.out 2>&1
  rc=$?
  echo "rc=$rc $(tail -1 logs/bench_$name.out)" >> $LOG
  echo "rc=$rc $(grep -m1 '"metric"' logs/bench_$name.out || tail -1 logs/bench_$name.out)" >> $RAW
}
# --- queue I: adjacent split-corr serving pair (decides serving default)
run serving_split_pairA --serving --quant
run serving_nosplit_pairB --serving --quant --no_split_corr
# --- queue J: batched-ref + int8-logit co-attention A/Bs
run serving_batchrefs --serving --quant --coattn_batch_refs
run serving_batchrefs_int8 --serving --quant --coattn_batch_refs --coattn_int8
run eval_ctrl
run eval_batchrefs --coattn_batch_refs
run eval_batchrefs_int8 --coattn_batch_refs --coattn_int8
run eval_int8only --coattn_int8
# --- queue H: scoped-vmem lever on serving/eval + train brackets
run serving_vmem64 --serving --quant --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run eval_vmem64 --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run train_k2b64_vmem64 --train --clips 64 --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run train_k8b16_vmem64 --train --frames 8 --clips 16 --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run train_k2b64_vmem48m --train --clips 64 --xla_opt xla_tpu_scoped_vmem_limit_kib=49152
run train_k2b64_vmem96m --train --clips 64 --xla_opt xla_tpu_scoped_vmem_limit_kib=98304
# --- queue I tail: corr/fusion serving breakdown
run serving_breakdown_corr --serving --quant --serving_breakdown
# --- queue K: ceiling probes
run eval_b80 --clips 80
run eval_b96 --clips 96
run serving_s100 --serving --quant --clips 20
run serving_s120 --serving --quant --clips 24
run train_k4b32_vmem64 --train --frames 4 --clips 32 --xla_opt xla_tpu_scoped_vmem_limit_kib=65536
run train_k4b32_default --train --frames 4 --clips 32
echo "QUEUE R4M DONE $(date +%H:%M:%S)" >> $RAW
