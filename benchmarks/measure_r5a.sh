#!/bin/bash
# Round-5 pass A: re-probe the two ga_bootstrap matrix cells (SET_1, SET_2)
# that died with Mosaic HTTP-500 in the round-4 MAIN pass — the round-4
# kernel fix (commit 712de51: factorized wide lane gather + cmux_delta vmem
# limit) was only re-verified at TFHEPP_L2/SET_3 (full_matrix_r4_perop2).
# This tells us whether the regression is already closed before the full r5
# matrix run.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export BENCH_DEVICE_PROBE=0
cd /root/repo

rm -rf /tmp/matrix_r5a
git -C /root/repo archive HEAD --prefix=matrix_r5a/ | tar -x -C /tmp

MATRIX_PER_OP=1 MATRIX_ONLY_OPS=ga_bootstrap \
  MATRIX_SETS=SET_1,SET_2 MATRIX_SET_TIMEOUT=1800 MOSFHET_GA_FUSED=1 \
  PYTHONPATH=/tmp/matrix_r5a:/root/.axon_site \
  timeout 3700 python /tmp/matrix_r5a/benchmarks/full_matrix_tpu.py \
  > /tmp/matrix_r5a_ga.jsonl 2> /tmp/matrix_r5a_ga.log
echo "PASS A DONE rc=$? $(date)" >> /tmp/measure_r5.log
