#!/bin/bash
# Round-4 queue, fifth pass (waits on pass D): reference benchmark-section
# parity rows at L2 (ks2/cb/fdfb), batch-1024 headline probe, TORUS32 at
# the new defaults.
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

# 1. reference benchmark-section parity rows (seeded multi-GiB tables)
leg suite_ks2     4000 SECTIONS=ks2 BENCH_BATCH=256 python benchmarks/bench_suite.py
leg suite_cb      4000 SECTIONS=cb BENCH_BATCH=256 python benchmarks/bench_suite.py
leg suite_fdfb    4000 SECTIONS=fdfb BENCH_BATCH=256 python benchmarks/bench_suite.py
# 2. batch-1024 headline probe (HBM allows it; does throughput scale?)
leg b1024         3000 BENCH_BATCH=1024 BENCH_TORUS32=0 BENCH_MXU=0 python bench.py
echo "QUEUE E DONE $(date)" >> /tmp/measure_r4.log
