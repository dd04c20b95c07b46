#!/bin/bash
# Round-4 measurement queue (real TPU, one chip, sequential legs).
#
# VERDICT r3 tasks 1-3: (a) MOSFHET_ROT_NTT hardware ablation, (b) BT
# (batch-tile / MXU-M) sweep under the default MXU plan, (c) the
# native-parameter pass/fail matrix at ALL FOUR sets through the hardened
# streamed-seeded-KS harness.  Quick decision legs first; the multi-hour
# matrix last.  Appends JSON rows to benchmarks/results_r4.jsonl; matrix
# rows to benchmarks/full_matrix_r4.jsonl; per-leg stderr under /tmp.
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

# --- 1. rotation-free CMUX step (MOSFHET_ROT_NTT) vs default -------------
# rotation = ~32% of MXU-plan kernel time (results_r3 ablate no_rot);
# bench decrypt-verifies, so a noise blowup shows as decrypt_ok=false.
leg rot_ntt       2400 MOSFHET_ROT_NTT=1 MOSFHET_NTT_MXU=1 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_BATCH=256 python bench.py
# --- 2. BT sweep under the MXU plan (int8 matmuls run at M=BT of 128) ----
leg bt64          2400 MOSFHET_BT=64  MOSFHET_NTT_MXU=1 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_BATCH=256 python bench.py
leg bt128         2400 MOSFHET_BT=128 MOSFHET_NTT_MXU=1 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_BATCH=256 python bench.py
# --- 3. combos: rot-NTT x larger tiles ------------------------------------
leg rot_bt64      2400 MOSFHET_ROT_NTT=1 MOSFHET_BT=64  MOSFHET_NTT_MXU=1 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_BATCH=256 python bench.py
leg rot_bt128     2400 MOSFHET_ROT_NTT=1 MOSFHET_BT=128 MOSFHET_NTT_MXU=1 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_BATCH=256 python bench.py
# --- 4. native-parameter matrix, ALL FOUR sets (VERDICT r3 task 1) -------
echo "== matrix start $(date)" >> /tmp/measure_r4.log
MATRIX_SETS=TFHEPP_L2,SET_3,SET_1,SET_2 MATRIX_SET_TIMEOUT=3300 \
  timeout 13600 python benchmarks/full_matrix_tpu.py \
  > benchmarks/full_matrix_r4.jsonl 2> /tmp/matrix_r4.log
echo "== matrix exit $? $(date)" >> /tmp/measure_r4.log
echo "QUEUE DONE $(date)" >> /tmp/measure_r4.log
