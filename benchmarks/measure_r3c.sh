#!/bin/bash
# Round-3 measurement queue, third pass (fresh machine after the restart
# that wiped /tmp): re-runs the legs that never landed — GA ran first
# standalone (this script waits for it), then the Mosaic DMA-alignment
# probes, the MXU-plan kernel ablation, the TFHEPP_L2+SET_3 native-
# parameter matrix (aborted RESOURCE_EXHAUSTED last time, suspected
# leftover device state from earlier legs — retried first-thing-ish on a
# clean chip), and the TP-split proxy.
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
  echo "== leg $name start $(date)" >> /tmp/measure_r3c.log
  timeout "$tmo" env "$@" > "/tmp/leg_${name}.out" 2> "/tmp/leg_${name}.err"
  local rc=$?
  echo "== leg $name exit $rc $(date)" >> /tmp/measure_r3c.log
  grep '^{' "/tmp/leg_${name}.out" | while read -r line; do
    printf '%s\n' "$line" | python3 -c "
import json,sys
row = json.loads(sys.stdin.read()); row['leg'] = '$name'
print(json.dumps(row))" >> "$R"
  done
}

# 1. Mosaic DMA slice-alignment probes (decides the GA stream relayout)
leg probe_dma_c   1800 python benchmarks/probe_dma.py
# 2. kernel ablation under the MXU plan (the next-perf-lever decider)
leg ablate_mxu_c  3600 MOSFHET_NTT_MXU=1 BENCH_BATCH=256 python benchmarks/ablate_kernel.py
# 3. native-parameter matrix: the round-3 capability criterion
echo "== matrix start $(date)" >> /tmp/measure_r3c.log
MATRIX_SETS=TFHEPP_L2,SET_3 timeout 15000 python benchmarks/full_matrix_tpu.py \
  > /tmp/full_matrix_r3c.jsonl 2> /tmp/matrix_r3c.log
rcm=$?
echo "== matrix exit $rcm $(date)" >> /tmp/measure_r3c.log
if grep -q '^{' /tmp/full_matrix_r3c.jsonl; then
  cp /tmp/full_matrix_r3c.jsonl benchmarks/full_matrix_r3_big.jsonl
fi
# 4. TP-split proxy on the fixed partial/finish kernels
leg tp_split_c    3600 BENCH_BATCH=256 python benchmarks/bench_tp_split.py
echo "QUEUE C DONE $(date)" >> /tmp/measure_r3c.log
