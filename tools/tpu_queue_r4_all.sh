#!/bin/bash
# Round-4 master queue: fixed serving breakdown, then queues B and C.
cd /root/repo
LOG=logs/tpu_r4_queue.log
echo "=== serving_breakdown_fixed: --serving --quant --serving_breakdown $(date +%H:%M:%S)" >> $LOG
python bench.py --serving --quant --serving_breakdown \
  > logs/bench_serving_breakdown.out 2>&1
echo "rc=$? $(tail -1 logs/bench_serving_breakdown.out)" >> $LOG
bash tools/tpu_queue_r4b.sh
bash tools/tpu_queue_r4c.sh
echo "QUEUE R4 MASTER DONE $(date +%H:%M:%S)" >> $LOG
