#!/bin/bash
# Round-5 pass B: circuit-bootstrap cells.
#  1. per-op CB at TFHEPP_L2 through the matrix harness (never re-run
#     after the round-4 kernel fixes; round 3 PASSED this cell).
#  2. SET_3 CB memory probe with full OOM diagnostics + reordered keygen
#     (both seeded tables before bk).
#  3. re-run the fixed probe_x experimental probes (VERDICT task 8).
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export BENCH_DEVICE_PROBE=0
cd /root/repo

rm -rf /tmp/matrix_r5b
git -C /root/repo archive HEAD --prefix=matrix_r5b/ | tar -x -C /tmp
# overlay the working tree's current benchmarks + package (pass B runs
# pre-commit code on purpose: it is the diagnosis pass)
cp -r /root/repo/mosfhet_tpu /root/repo/benchmarks /tmp/matrix_r5b/ 2>/dev/null

E="env PYTHONPATH=/tmp/matrix_r5b:/root/.axon_site"

MATRIX_PER_OP=1 MATRIX_ONLY_OPS=circuit_bootstrap \
  MATRIX_SETS=TFHEPP_L2 MATRIX_SET_TIMEOUT=2400 \
  $E timeout 2500 python /tmp/matrix_r5b/benchmarks/full_matrix_tpu.py \
  > /tmp/r5b_cb_l2.jsonl 2> /tmp/r5b_cb_l2.log
echo "B1 rc=$? $(date)" >> /tmp/measure_r5.log

CB_SET=SET_3 $E timeout 3000 python \
  /tmp/matrix_r5b/benchmarks/probe_cb_mem.py \
  > /tmp/r5b_cb_set3.jsonl 2> /tmp/r5b_cb_set3.log
echo "B2 rc=$? $(date)" >> /tmp/measure_r5.log

PROBE_PRODUCTION=0 PROBE_EXPERIMENTAL=1 \
  $E timeout 1200 python /tmp/matrix_r5b/benchmarks/probe_all.py \
  > /tmp/r5b_probe_x.jsonl 2> /tmp/r5b_probe_x.log
echo "B3 rc=$? $(date)" >> /tmp/measure_r5.log
echo "PASS B DONE $(date)" >> /tmp/measure_r5.log
