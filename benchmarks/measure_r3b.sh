#!/bin/bash
# Round-3 measurement queue, second pass: re-runs the legs that failed on
# the three hardware-only Mosaic bugs (1-D gather in the MXU NTT paths,
# i64 scratch/semaphore indices in the GA DMA stream, i64 SMEM index map
# in the TP partial kernel) after their fixes, plus the reworked MV
# methodology and the restructured per-set-subprocess matrix.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r3.jsonl

leg () {  # leg <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== leg $name start $(date)" >> /tmp/measure_r3b.log
  timeout "$tmo" env "$@" > "/tmp/leg_${name}.out" 2> "/tmp/leg_${name}.err"
  local rc=$?
  echo "== leg $name exit $rc $(date)" >> /tmp/measure_r3b.log
  grep '^{' "/tmp/leg_${name}.out" | while read -r line; do
    printf '%s\n' "$line" | python3 -c "
import json,sys
row = json.loads(sys.stdin.read()); row['leg'] = '$name'
print(json.dumps(row))" >> "$R"
  done
}

# 1. headline with the in-process MXU ablation (the round-3 perf decider)
leg headline_b    3600 BENCH_BATCH=256 python bench.py
# 2. GA bootstrap on the fixed DMA-stream kernel
leg ga_b          3600 BENCH_BATCH=256 python benchmarks/bench_ga.py
# 3. TORUS32 under MXU
leg mxu_torus32_b 3600 MOSFHET_TORUS_BITS=32 MOSFHET_NTT_MXU=1 BENCH_BATCH=256 python benchmarks/bench_torus32.py
# 4. MV phase-2 marginal-cost methodology + gate chains
leg composite_b   4500 BENCH_BATCH=256 python benchmarks/bench_composite.py
# 5. TP-split proxy on the fixed partial/finish kernels
leg tp_split_b    3600 BENCH_BATCH=256 python benchmarks/bench_tp_split.py
# 6. batch-512 headline (with MXU ablation)
leg headline512_b 3600 BENCH_BATCH=512 python bench.py
# 7. native-parameter matrix, per-set subprocesses, staged key lifetimes
echo "== matrix start $(date)" >> /tmp/measure_r3b.log
MATRIX_SETS=TFHEPP_L2,SET_3 timeout 14000 python benchmarks/full_matrix_tpu.py \
  > benchmarks/full_matrix_r3_big.jsonl 2> /tmp/matrix_r3b.log
echo "== matrix exit $? $(date)" >> /tmp/measure_r3b.log
echo "QUEUE B DONE $(date)" >> /tmp/measure_r3b.log
