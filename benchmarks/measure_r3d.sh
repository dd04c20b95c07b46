#!/bin/bash
# Round-3 measurement queue, fourth pass (runs after the rerun of the
# native-parameter matrix): batch-512 headline under the MXU-default
# bench (the earlier 512 MXU leg predated the Mosaic layout fixes), a
# BT=64 tile ablation, and the TP-split proxy row that never landed.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r3.jsonl
WAIT_PID=${1:-}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

leg () {  # leg <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== leg $name start $(date)" >> /tmp/claude-0/measure_r3d.log
  timeout "$tmo" env "$@" > "/tmp/claude-0/leg_${name}.out" \
      2> "/tmp/claude-0/leg_${name}.err"
  local rc=$?
  echo "== leg $name exit $rc $(date)" >> /tmp/claude-0/measure_r3d.log
  grep '^{' "/tmp/claude-0/leg_${name}.out" | while read -r line; do
    printf '%s\n' "$line" | python3 -c "
import json,sys
row = json.loads(sys.stdin.read()); row['leg'] = '$name'
print(json.dumps(row))" >> "$R"
  done
}

# 1. batch-512 headline (MXU default; roll as in-process alternate)
leg headline512_d 2400 BENCH_BATCH=512 BENCH_TORUS32=0 python bench.py
# 2. BT=64 batch-tile ablation at 256 (cheap env experiment)
leg bt64_d        2400 BENCH_BATCH=256 BENCH_TORUS32=0 MOSFHET_BT=64 python bench.py
# 3. TP-split proxy (VERDICT item 4 hardware row, never landed)
leg tp_split_d    2400 BENCH_BATCH=256 python benchmarks/bench_tp_split.py
echo "QUEUE D DONE $(date)" >> /tmp/claude-0/measure_r3d.log
