#!/bin/bash
# Retry of the failed serving_donate (axon tunnel outage), chained after A.
cd /root/repo
while kill -0 $(cat /tmp/r4a.pid) 2>/dev/null; do sleep 30; done
LOG=logs/tpu_r4_queue.log
echo "=== serving_donate_retry: --serving --quant $(date +%H:%M:%S)" >> $LOG
python bench.py --serving --quant > logs/bench_serving_donate.out 2>&1
echo "rc=$? $(tail -1 logs/bench_serving_donate.out)" >> $LOG
echo "QUEUE R4A2 DONE $(date +%H:%M:%S)" >> $LOG
