#!/bin/bash
# Round-4 TPU queue E: restart after the 06:31 session reset SIGTERMed
# queue B inside `make_converge32 --bert` (checkpointed at epoch 18).
# Finish the BERT lock (auto-resumes), then queue C (LSTM lock +
# scoped-vmem sweep via --xla_opt) and queue D (A/Bs for commit 5aa3a2d:
# rotating rings + single-direction fused co-attention).
cd /root/repo
LOG=logs/tpu_r4_queue.log
echo "=== make_converge32 --bert (resume from ep18) $(date +%H:%M:%S)" >> $LOG
python tools/make_converge32.py --bert > logs/make_converge32bert2.out 2>&1
echo "rc=$? $(tail -3 logs/make_converge32bert2.out | head -1)" >> $LOG
bash tools/tpu_queue_r4c.sh
bash tools/tpu_queue_r4d.sh
echo "QUEUE R4E DONE $(date +%H:%M:%S)" >> $LOG
