#!/bin/bash
# Round-3 measurement queue (real TPU, one chip, sequential legs).
#
# Each leg is its own process (the axon tunnel serves one client at a
# time).  Quick, decision-relevant legs run first so a tunnel drop
# mid-queue still leaves the ablation data; the multi-hour native-
# parameter matrix runs last.  Appends JSON rows to
# benchmarks/results_r3.jsonl and writes the matrix to
# benchmarks/full_matrix_r3_big.jsonl; per-leg stderr under /tmp.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
# the watcher only starts this queue after a successful device probe
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r3.jsonl

leg () {  # leg <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== leg $name start $(date)" >> /tmp/measure_r3.log
  timeout "$tmo" env "$@" > "/tmp/leg_${name}.out" 2> "/tmp/leg_${name}.err"
  local rc=$?
  echo "== leg $name exit $rc $(date)" >> /tmp/measure_r3.log
  # keep only JSON rows (lines starting with '{'), tagged with the leg name
  grep '^{' "/tmp/leg_${name}.out" | while read -r line; do
    printf '%s\n' "$line" | python3 -c "
import json,sys
row = json.loads(sys.stdin.read()); row['leg'] = '$name'
print(json.dumps(row))" >> "$R"
  done
}

# 1. MXU int8 forward-NTT tail ablation (the open perf question).
#    BENCH_TORUS32=0: the u64 ablation must not re-run (and silently
#    reconfigure) the 20-minute TORUS32 subprocess.
leg mxu_tail      3000 MOSFHET_NTT_MXU=1 BENCH_TORUS32=0 BENCH_BATCH=256 python bench.py
# 2. narrow-prime depth-3 lazy-chain ablation
leg narrow_primes 3000 MOSFHET_NTT_PRIMES=narrow BENCH_TORUS32=0 BENCH_MXU=0 BENCH_BATCH=256 python bench.py
# 3. headline (default path, post round-3 commits; includes TORUS32 leg)
leg headline      3000 BENCH_BATCH=256 python bench.py
# 3b. TORUS32 under MXU, as its own labeled ablation row
leg mxu_torus32   3000 MOSFHET_TORUS_BITS=32 MOSFHET_NTT_MXU=1 BENCH_BATCH=256 python benchmarks/bench_torus32.py
# 4. GA bootstrap after the in-kernel DMA-streamed AK gather
leg ga            3000 BENCH_BATCH=256 python benchmarks/bench_ga.py
# 5. MV phase-2 compose after the extraction reorder
leg mv            3000 SECTIONS=mv BENCH_BATCH=256 python benchmarks/bench_suite.py
# 6. batch-512 headline (BENCH default batch)
leg headline512   3000 BENCH_BATCH=512 python bench.py
# 6b. kernel-TP split overhead on one chip (VERDICT r2 task 4 hardware row;
#     compute-side proxy — real 2-chip ICI needs hardware we don't have)
leg tp_split      3000 BENCH_BATCH=256 python benchmarks/bench_tp_split.py
# 6c. per-phase kernel time split (round-3 re-baseline; default NTT plan —
#     ablate_kernel builds its own 8-ref kernels, so keep MXU env unset)
leg ablate        3000 BENCH_BATCH=256 python benchmarks/ablate_kernel.py
# 7. native-parameter matrix at the big sets (streamed seeded-KS cells)
echo "== matrix start $(date)" >> /tmp/measure_r3.log
MATRIX_SETS=TFHEPP_L2,SET_3 timeout 14000 python benchmarks/full_matrix_tpu.py \
  > benchmarks/full_matrix_r3_big.jsonl 2> /tmp/matrix_r3_big.log
echo "== matrix exit $? $(date)" >> /tmp/measure_r3.log
echo "QUEUE DONE $(date)" >> /tmp/measure_r3.log
