#!/bin/bash
# Round-5 pass H2 (replaces H, whose running copy was invalidated by
# in-flight script edits): the three legs pass F skipped for the same
# reason, then the original H closure legs.  Waits for pass G.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
R=benchmarks/results_r5.jsonl

while ! grep -q "PASS G DONE" /tmp/measure_r5.log 2>/dev/null; do sleep 60; done

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

# --- legs skipped by the edited pass-F runner ---------------------------
leg hbm_honest    900 python benchmarks/probe_hbm.py
leg cb_priv1     3600 CB_SET=SET_3 CB_ORDER=priv_first MOSFHET_KEYGEN_CHUNK=1024 python benchmarks/probe_cb_mem.py
leg ubr_u8_mc32  3000 MOSFHET_UBR_V2=1 MOSFHET_UBR_MC=32 BENCH_UNFOLDS=8 BENCH_LUTS=256 python benchmarks/bench_unfolded.py

# --- original H closure legs --------------------------------------------
export JAX_CACHE_DIR=/root/.cache/jax_mosfhet
leg cache_a     2400 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_MFU=0 BENCH_REPS=1 BENCH_BATCH=256 python bench.py
leg cache_b     2400 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_MFU=0 BENCH_REPS=1 BENCH_BATCH=256 python bench.py
leg composite   3600 BENCH_BATCH=256 python benchmarks/bench_composite.py
leg fused1024   2400 BENCH_MXU=0 BENCH_TORUS32=0 BENCH_BATCH=1024 python bench.py
leg final512    4000 BENCH_BATCH=512 python bench.py
echo "PASS H2 DONE $(date)" >> /tmp/measure_r5.log
