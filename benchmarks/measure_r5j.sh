#!/bin/bash
# Round-5 pass J (waits for pass I): SET_3 co-residency adjacency probe.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
while ! grep -q "PASS I DONE" /tmp/measure_r5.log 2>/dev/null; do sleep 60; done
MOSFHET_KEYGEN_CHUNK=512 timeout 1800 python benchmarks/probe_coresident.py \
  > /tmp/leg_coresident.out 2> /tmp/leg_coresident.err
echo "== leg coresident exit $? $(date)" >> /tmp/measure_r5.log
echo "PASS J DONE $(date)" >> /tmp/measure_r5.log
