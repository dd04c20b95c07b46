#!/bin/bash
# Round-4 queue, fourth pass (waits for the matrix snapshot run to exit):
# hardware probes for the dynamic-gather permute, GA bench with/without
# the fused permute, per-op matrix children for the two OOM cells, the
# full production probe pass, and the BT=64 headline preview.
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

# 1. dynamic-gather permute probes (gates the GA fused kernel)
leg probe_x2      1800 PROBE_PRODUCTION=0 python benchmarks/probe_all.py
# 2. GA bench: fused in-kernel permute vs XLA permute (both decrypt-verified)
leg ga_fused      3000 MOSFHET_GA_FUSED=1 BENCH_BATCH=256 python benchmarks/bench_ga.py
leg ga_unfused    3000 MOSFHET_GA_FUSED=0 BENCH_BATCH=256 python benchmarks/bench_ga.py
# 3. per-op matrix children for the RESOURCE_EXHAUSTED cells (fresh TPU
#    client + minimal keygen per op; GA runs the round-3-proven config)
echo "== matrix per-op start $(date)" >> /tmp/measure_r4.log
MATRIX_PER_OP=1 MATRIX_ONLY_OPS=circuit_bootstrap,ga_bootstrap \
  MATRIX_SETS=TFHEPP_L2,SET_3 MATRIX_SET_TIMEOUT=3300 MOSFHET_GA_FUSED=0 \
  timeout 13600 python benchmarks/full_matrix_tpu.py \
  > benchmarks/full_matrix_r4_perop.jsonl 2> /tmp/matrix_r4_perop.log
echo "== matrix per-op exit $? $(date)" >> /tmp/measure_r4.log
# 4. production compile probes (every kernel entry point, real toolchain)
leg probe_prod    7200 PROBE_EXPERIMENTAL=0 python benchmarks/probe_all.py
# 5. headline preview with the new defaults (BT=64), incl. TORUS32 leg
leg headline_r4   4000 BENCH_BATCH=512 python bench.py
echo "QUEUE D DONE $(date)" >> /tmp/measure_r4.log
