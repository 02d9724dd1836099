#!/bin/bash
# Round-5 chip queue (run AFTER the dbpedia+streaming queue finishes):
# driver-style headline + the remaining VERDICT r4 artifacts.
set -x
cd /root/repo
# 9: bounded point reproduced driver-side (bench.py runs the agg sweep)
timeout 3600 python bench.py > /tmp/bench_r5_self.json 2>/tmp/bench_r5_self.log
# 7: Deep-10M e2e + p50 (gt cached after first run)
timeout 7200 python -m vector_store_tpu.benchkit.scale deep10m >> /tmp/queue_r5.log 2>&1
# 3: filter diversity at 1M (>=128 distinct signatures per band)
SCALE_N=1000000 timeout 5400 python -m vector_store_tpu.benchkit.scale filtered-diverse >> /tmp/queue_r5.log 2>&1
# 5: graph preview lever measured at 1M
VECTOR_STORE_GRAPH_PREVIEW=32 SCALE_N=1000000 timeout 7200 python -m vector_store_tpu.benchkit.scale graph >> /tmp/queue_r5.log 2>&1
