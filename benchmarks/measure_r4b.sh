#!/bin/bash
# Round-4 queue, second pass: hardware compile probes (probe_all), the
# BT=64 batch-512 headline confirmation, then the 4-set native-parameter
# matrix (the long pole).
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r4.jsonl

leg () {  # leg <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== leg $name start $(date)" >> /tmp/measure_r4.log
  timeout "$tmo" env "$@" > "/tmp/leg_${name}.out" 2> "/tmp/leg_${name}.err"
  local rc=$?
  echo "== leg $name exit $rc $(date)" >> /tmp/measure_r4.log
  grep '^{' "/tmp/leg_${name}.out" | while read -r line; do
    printf '%s\n' "$line" | python3 -c "
import json,sys
row = json.loads(sys.stdin.read()); row['leg'] = '$name'
print(json.dumps(row))" >> "$R"
  done
}

# 1. experimental probes only (fast; gates the GA permute fusion design)
leg probe_x       1800 PROBE_PRODUCTION=0 python benchmarks/probe_all.py
# 2. BT=64 batch-512 headline confirmation (BT=64 won at 256: 441 vs 422)
leg bt64_512      2400 MOSFHET_BT=64 MOSFHET_NTT_MXU=1 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_BATCH=512 python bench.py
# 3. native-parameter matrix, ALL FOUR sets (VERDICT r3 task 1)
echo "== matrix start $(date)" >> /tmp/measure_r4.log
MATRIX_SETS=TFHEPP_L2,SET_3,SET_1,SET_2 MATRIX_SET_TIMEOUT=3300 \
  timeout 13600 python benchmarks/full_matrix_tpu.py \
  > benchmarks/full_matrix_r4.jsonl 2> /tmp/matrix_r4.log
echo "== matrix exit $? $(date)" >> /tmp/measure_r4.log
# 4. production probes (once per round; after matrix so it can't delay it)
leg probe_prod    7200 PROBE_EXPERIMENTAL=0 python benchmarks/probe_all.py
echo "QUEUE B DONE $(date)" >> /tmp/measure_r4.log
