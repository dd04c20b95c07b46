#!/bin/bash
# Round-5 pass M: final SET_3 CB attempt — plain keygen path (the staged
# variants both fail through this backend), warm compile cache,
# priv-first order, chunk 1024.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
CB_SET=SET_3 CB_ORDER=priv_first MOSFHET_KEYGEN_CHUNK=1024 \
  timeout 5400 python benchmarks/probe_cb_mem.py \
  > /tmp/leg_cb_final.out 2> /tmp/leg_cb_final.err
echo "== leg cb_final exit $? $(date)" >> /tmp/measure_r5.log
echo "PASS M DONE $(date)" >> /tmp/measure_r5.log
