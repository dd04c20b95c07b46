#!/bin/bash
# Round-5 pass I (waits for pass H2): GA one-kernel tile sweep — bt=128
# halves the per-step DMA count and doubles the MXU M-dim; the last
# 0.3 ms to the < 3.5 ms GA target.  Plus a TORUS32 headline with the
# fused scan (855.7 was the scan-form number).
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r5.jsonl

while ! grep -q "PASS H2 DONE" /tmp/measure_r5.log 2>/dev/null; do sleep 60; done

leg () {
  local name=$1 tmo=$2; shift 2
  echo "== leg $name start $(date)" >> /tmp/measure_r5.log
  timeout "$tmo" env "$@" > "/tmp/leg_${name}.out" 2> "/tmp/leg_${name}.err"
  local rc=$?
  echo "== leg $name exit $rc $(date)" >> /tmp/measure_r5.log
  grep '^{' "/tmp/leg_${name}.out" | while read -r line; do
    printf '%s\n' "$line" | python3 -c "
import json,sys
row = json.loads(sys.stdin.read()); row['leg'] = '$name'
print(json.dumps(row))" >> "$R"
  done
}

leg ga_onek_bt128 3000 MOSFHET_GA_ONEKERNEL=1 MOSFHET_BT=128 BENCH_MXU=0 BENCH_BATCH=256 python benchmarks/bench_ga.py
echo "PASS I DONE $(date)" >> /tmp/measure_r5.log
