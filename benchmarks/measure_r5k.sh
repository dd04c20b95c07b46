#!/bin/bash
# Round-5 pass K (waits for pass J): SET_3 circuit bootstrap with the
# host-staged seeded-table keygen (MOSFHET_KEYGEN_HOST=1) — the fix for
# the last infra cell of the 44-cell matrix.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
while ! grep -q "PASS J DONE" /tmp/measure_r5.log 2>/dev/null; do sleep 60; done
CB_SET=SET_3 MOSFHET_KEYGEN_HOST=1 MOSFHET_KEYGEN_CHUNK=1024 \
  timeout 5400 python benchmarks/probe_cb_mem.py \
  > /tmp/leg_cb_host.out 2> /tmp/leg_cb_host.err
echo "== leg cb_host exit $? $(date)" >> /tmp/measure_r5.log
echo "PASS K DONE $(date)" >> /tmp/measure_r5.log
