#!/bin/bash
# Round-5 pass E (waits for pass D): UBR phase-1 v2 (streaming scalar-roll
# combine) — hardware probe, then measured u=8 (and u=4) rows for both
# kernels.  VERDICT task 6 target: u=8 phase-1 < 80 ms/ct (was ~130).
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r5.jsonl

while ! grep -q "PASS D DONE" /tmp/measure_r5.log 2>/dev/null; do sleep 30; done

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

leg probe_ubr2   1800 PROBE_PRODUCTION=1 PROBE_EXPERIMENTAL=0 PROBE_ONLY=ubr_phase1_v2 python benchmarks/probe_all.py
leg ubr_u8_v2    3000 MOSFHET_UBR_V2=1 BENCH_UNFOLDS=8 BENCH_LUTS=256 python benchmarks/bench_unfolded.py
leg ubr_u8_v1    3000 MOSFHET_UBR_V2=0 BENCH_UNFOLDS=8 BENCH_LUTS=256 python benchmarks/bench_unfolded.py
leg ubr_u4_v2    2400 MOSFHET_UBR_V2=1 BENCH_UNFOLDS=4 BENCH_LUTS=256 python benchmarks/bench_unfolded.py
echo "PASS E DONE $(date)" >> /tmp/measure_r5.log
