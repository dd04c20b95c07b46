#!/bin/bash
# Round-5 pass F (waits for pass E): GA whole-scan fused kernel.
#  1. hardware compile probe of ga_scan_fused.
#  2. GA bench: onekernel vs round-4 two-kernel form (4.105 ms/op @256).
#     VERDICT task 5 target: < 3.5 ms/op decrypt-OK.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r5.jsonl

while ! grep -q "PASS E DONE" /tmp/measure_r5.log 2>/dev/null; do sleep 30; done

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

leg ubr_u8_mc32  3000 MOSFHET_UBR_V2=1 MOSFHET_UBR_MC=32 BENCH_UNFOLDS=8 BENCH_LUTS=256 python benchmarks/bench_unfolded.py
leg hbm_honest    900 python benchmarks/probe_hbm.py
leg cb_priv1     3600 CB_SET=SET_3 CB_ORDER=priv_first MOSFHET_KEYGEN_CHUNK=1024 python benchmarks/probe_cb_mem.py
leg probe_ga1k   1800 PROBE_PRODUCTION=1 PROBE_EXPERIMENTAL=0 PROBE_ONLY=ga_scan_fused python benchmarks/probe_all.py
leg ga_onek      3000 MOSFHET_GA_ONEKERNEL=1 BENCH_BATCH=256 python benchmarks/bench_ga.py
echo "PASS F DONE $(date)" >> /tmp/measure_r5.log
