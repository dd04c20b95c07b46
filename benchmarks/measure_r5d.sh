#!/bin/bash
# Round-5 pass D (waits for pass C): SET_3 circuit-bootstrap closure.
#  1. usable-HBM ceiling probe.
#  2. SET_3 CB probe with capped keygen chunks (MOSFHET_KEYGEN_CHUNK=512).
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo

while ! grep -q "PASS C DONE" /tmp/measure_r5.log 2>/dev/null; do sleep 30; done

timeout 600 python benchmarks/probe_hbm.py \
  > /tmp/r5d_hbm.jsonl 2> /tmp/r5d_hbm.log
echo "D1 rc=$? $(date)" >> /tmp/measure_r5.log

CB_SET=SET_3 MOSFHET_KEYGEN_CHUNK=512 timeout 3600 python \
  benchmarks/probe_cb_mem.py \
  > /tmp/r5d_cb_set3.jsonl 2> /tmp/r5d_cb_set3.log
echo "D2 rc=$? $(date)" >> /tmp/measure_r5.log
echo "PASS D DONE $(date)" >> /tmp/measure_r5.log
