#!/bin/bash
# Round-4 queue, recovery pass (the machine restarted before passes D/E
# ran): re-runs the lost legs in judge-value order.  Matrix children run
# from a frozen snapshot (/tmp/matrix_r4) per the developer notes.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r4.jsonl

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

# 0. freeze a code snapshot for the matrix children
rm -rf /tmp/matrix_r4
git -C /root/repo archive HEAD --prefix=matrix_r4/ | tar -x -C /tmp

# 1. GA bench with the fused in-kernel permute (VERDICT task 4 target
#    <= 4.8 ms/op @ 256; round-3 unfused was 5.32)
leg ga_fused      1800 MOSFHET_GA_FUSED=1 BENCH_BATCH=256 python benchmarks/bench_ga.py

# 2. per-op matrix children for the four RESOURCE_EXHAUSTED cells
echo "== matrix per-op start $(date)" >> /tmp/measure_r4.log
MATRIX_PER_OP=1 MATRIX_ONLY_OPS=circuit_bootstrap,ga_bootstrap \
  MATRIX_SETS=TFHEPP_L2,SET_3 MATRIX_SET_TIMEOUT=1600 MOSFHET_GA_FUSED=0 \
  PYTHONPATH=/tmp/matrix_r4:/root/.axon_site \
  timeout 6600 python /tmp/matrix_r4/benchmarks/full_matrix_tpu.py \
  > benchmarks/full_matrix_r4_perop.jsonl 2> /tmp/matrix_r4_perop.log
echo "== matrix per-op exit $? $(date)" >> /tmp/measure_r4.log

# 3. reference benchmark-section parity rows (pass E legs)
leg suite_ks2     1500 SECTIONS=ks2 BENCH_BATCH=256 python benchmarks/bench_suite.py
leg suite_cb      1500 SECTIONS=cb BENCH_BATCH=256 python benchmarks/bench_suite.py
leg suite_fdfb    1500 SECTIONS=fdfb BENCH_BATCH=256 python benchmarks/bench_suite.py

# 4. batch-1024 headline probe
leg b1024         1200 BENCH_BATCH=1024 BENCH_TORUS32=0 BENCH_MXU=0 python bench.py

# 5. GA unfused control (round-3 number exists; re-measure for same-code row)
leg ga_unfused    1500 MOSFHET_GA_FUSED=0 BENCH_BATCH=256 python benchmarks/bench_ga.py

# 6. production compile probes (every kernel entry point)
leg probe_prod    2400 PROBE_EXPERIMENTAL=0 python benchmarks/probe_all.py

# 7. complete the 4-set r4 matrix (SET_1, SET_2 full-set children)
echo "== matrix set12 start $(date)" >> /tmp/measure_r4.log
MATRIX_SETS=SET_1,SET_2 MATRIX_SET_TIMEOUT=3300 \
  PYTHONPATH=/tmp/matrix_r4:/root/.axon_site \
  timeout 7000 python /tmp/matrix_r4/benchmarks/full_matrix_tpu.py \
  >> benchmarks/full_matrix_r4.jsonl 2> /tmp/matrix_r4_set12.log
echo "== matrix set12 exit $? $(date)" >> /tmp/measure_r4.log
echo "QUEUE F DONE $(date)" >> /tmp/measure_r4.log
