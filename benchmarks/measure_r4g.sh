#!/bin/bash
# Round-4 queue, pass G (waits on pass F): re-run the GA legs and the
# failed matrix cells with the fixed kernels (factorized fused permute,
# cmux_delta 100 MiB vmem limit — commit 712de51).
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r4.jsonl
WAIT_PID=${1:-}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

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

rm -rf /tmp/matrix_r4g
git -C /root/repo archive HEAD --prefix=matrix_r4g/ | tar -x -C /tmp

# 1. GA bench, fused in-kernel permute (fixed factorized gather)
leg ga_fused2     2000 MOSFHET_GA_FUSED=1 BENCH_BATCH=256 python benchmarks/bench_ga.py

# 2. failed matrix cells, fixed code: GA at both sets, CB at SET_3
echo "== matrix per-op G start $(date)" >> /tmp/measure_r4.log
MATRIX_PER_OP=1 MATRIX_ONLY_OPS=ga_bootstrap \
  MATRIX_SETS=TFHEPP_L2,SET_3 MATRIX_SET_TIMEOUT=1600 MOSFHET_GA_FUSED=1 \
  PYTHONPATH=/tmp/matrix_r4g:/root/.axon_site \
  timeout 3400 python /tmp/matrix_r4g/benchmarks/full_matrix_tpu.py \
  > benchmarks/full_matrix_r4_perop2.jsonl 2> /tmp/matrix_r4g_ga.log
MATRIX_PER_OP=1 MATRIX_ONLY_OPS=circuit_bootstrap \
  MATRIX_SETS=SET_3 MATRIX_SET_TIMEOUT=1600 \
  PYTHONPATH=/tmp/matrix_r4g:/root/.axon_site \
  timeout 1700 python /tmp/matrix_r4g/benchmarks/full_matrix_tpu.py \
  >> benchmarks/full_matrix_r4_perop2.jsonl 2> /tmp/matrix_r4g_cb.log
echo "== matrix per-op G exit $? $(date)" >> /tmp/measure_r4.log

# 3. suite ks2 rerun (independent sub-benches now): recover lut/cdks rows
leg suite_ks2b    1800 SECTIONS=ks2 BENCH_BATCH=256 python benchmarks/bench_suite.py
echo "QUEUE G DONE $(date)" >> /tmp/measure_r4.log
