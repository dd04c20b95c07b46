#!/bin/bash
# Round-5 pass L: SET_3 circuit bootstrap, device-staged keygen.
set -u
export PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
       PALLAS_AXON_TPU_GEN=v5e AXON_LOOPBACK_RELAY=1 TPU_SKIP_MDS_QUERY=1
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_DEVICE_PROBE=0
cd /root/repo
CB_SET=SET_3 MOSFHET_KEYGEN_HOST=1 MOSFHET_KEYGEN_CHUNK=1024 \
  timeout 5400 python benchmarks/probe_cb_mem.py \
  > /tmp/leg_cb_staged.out 2> /tmp/leg_cb_staged.err
echo "== leg cb_staged exit $? $(date)" >> /tmp/measure_r5.log
echo "PASS L DONE $(date)" >> /tmp/measure_r5.log
