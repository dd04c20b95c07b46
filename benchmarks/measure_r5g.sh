#!/bin/bash
# Round-5 pass G (waits for pass F): the FULL native-parameter matrix,
# 11 ops x 4 sets, per-op-group children, per-cell `match` field.
# Target: zero infra-failures (VERDICT task 1).
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export BENCH_DEVICE_PROBE=0
cd /root/repo

while ! grep -q "PASS F DONE" /tmp/measure_r5.log 2>/dev/null; do sleep 30; done

rm -rf /tmp/matrix_r5g
git -C /root/repo archive HEAD --prefix=matrix_r5g/ | tar -x -C /tmp

# MOSFHET_FUSED_SCAN=0: the matrix is a PARITY run — stay on the
# per-step scan kernel that every set's geometry has already passed with
MATRIX_PER_OP=1 MATRIX_SET_TIMEOUT=2400 \
  MOSFHET_FUSED_SCAN=0 MOSFHET_GA_FUSED=1 MOSFHET_KEYGEN_CHUNK=512 \
  MATRIX_SETS=TFHEPP_L2,SET_1,SET_2,SET_3 \
  PYTHONPATH=/tmp/matrix_r5g:/root/.axon_site \
  timeout 28000 python /tmp/matrix_r5g/benchmarks/full_matrix_tpu.py \
  > benchmarks/full_matrix_r5.jsonl 2> /tmp/matrix_r5g.log
echo "G1 rc=$? $(date)" >> /tmp/measure_r5.log
echo "PASS G DONE $(date)" >> /tmp/measure_r5.log
