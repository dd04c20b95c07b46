#!/bin/bash
# Round-5 pass N: GA cells from FINAL HEAD (one-kernel default,
# deterministic seeds) at SET_1/SET_2 — validates ga_scan_fused at two
# more geometries and pins the deterministic marginal-cell outcome.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export BENCH_DEVICE_PROBE=0
cd /root/repo
rm -rf /tmp/matrix_r5n
git -C /root/repo archive HEAD --prefix=matrix_r5n/ | tar -x -C /tmp
MATRIX_PER_OP=1 MATRIX_ONLY_OPS=ga_bootstrap \
  MATRIX_SETS=SET_1,SET_2 MATRIX_SET_TIMEOUT=2000 \
  PYTHONPATH=/tmp/matrix_r5n:/root/.axon_site \
  timeout 4200 python /tmp/matrix_r5n/benchmarks/full_matrix_tpu.py \
  > /tmp/matrix_r5n_ga.jsonl 2> /tmp/matrix_r5n_ga.log
echo "== pass N exit $? $(date)" >> /tmp/measure_r5.log
echo "PASS N DONE $(date)" >> /tmp/measure_r5.log
