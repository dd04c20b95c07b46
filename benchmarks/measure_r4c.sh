#!/bin/bash
# Round-4 queue, third pass: the 4-set native-parameter matrix, run from
# a frozen code snapshot (/tmp/matrix_r4) so repo edits during the
# multi-hour run cannot perturb later sets' subprocesses.  Results land
# in the repo as usual.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/tmp/matrix_r4:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /tmp/matrix_r4

echo "== matrix start $(date)" >> /tmp/measure_r4.log
MATRIX_SETS=TFHEPP_L2,SET_3,SET_1,SET_2 MATRIX_SET_TIMEOUT=3300 \
  timeout 13600 python benchmarks/full_matrix_tpu.py \
  > /root/repo/benchmarks/full_matrix_r4.jsonl 2> /tmp/matrix_r4.log
echo "== matrix exit $? $(date)" >> /tmp/measure_r4.log
echo "MATRIX QUEUE DONE $(date)" >> /tmp/measure_r4.log
