#!/bin/bash
# Round-5 pass C (waits for pass B): performance legs.
#  1. whole-scan fused blind rotate (MOSFHET_FUSED_SCAN=1) headline at
#     batch 256 and 512 — vs the round-4 scan numbers (441 / 460 boot/s).
#  2. MV phase-2 compose sweep K=64/256/1024 (VERDICT task 4).
#  3. fused-scan hardware compile probe (belt and braces before 1).
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r5.jsonl

while ! grep -q "PASS B DONE" /tmp/measure_r5.log 2>/dev/null; do sleep 30; done

leg () {  # leg <name> <timeout_s> <cmd...>
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

leg probe_fused  1200 PROBE_PRODUCTION=1 PROBE_EXPERIMENTAL=0 PROBE_ONLY=fused python benchmarks/probe_all.py
leg fused256     2400 MOSFHET_FUSED_SCAN=1 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_BATCH=256 python bench.py
leg fused512     2400 MOSFHET_FUSED_SCAN=1 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_BATCH=512 python bench.py
leg mv2          2400 BENCH_BATCH=256 python benchmarks/bench_mv2.py
echo "PASS C DONE $(date)" >> /tmp/measure_r5.log
