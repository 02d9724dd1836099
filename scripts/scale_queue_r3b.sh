#!/bin/bash
# Round-3 follow-up queue: the runs whose artifacts are still pending a
# relay recovery window (graph-at-1M with bridge candidates, dbpedia-bf16
# with the >=512-d 2x oversample, dual-regime partition bench), then a
# bench.py prewarm so the driver's final run is compile-free.
# Waits for the relay before each run; per-run timeouts bound outages.
set -u
cd /root/repo
mkdir -p scale_logs
echo "=== queue5 start $(date) ===" >> scale_logs/queue.log
wait_relay() {
  until timeout 90 python -c "import jax; jax.numpy.ones(4).sum()" >/dev/null 2>&1; do
    echo "relay dark $(date)" >> scale_logs/queue.log
    sleep 240
  done
  echo "relay up $(date)" >> scale_logs/queue.log
}
run() {
  local name=$1 budget=$2; shift 2
  wait_relay
  echo "--- $name (budget ${budget}s) $(date) ---" >> scale_logs/queue.log
  timeout "$budget" python -m vector_store_tpu.benchkit.scale "$name" \
    >> scale_logs/queue.log 2> "scale_logs/$name.log"
  echo "--- $name rc=$? $(date) ---" >> scale_logs/queue.log
}
run partition 3600
SCALE_N=1000000 run graph 5400
run dbpedia-bf16 4800
wait_relay
echo "--- bench prewarm $(date) ---" >> scale_logs/queue.log
timeout 3600 python bench.py >> scale_logs/queue.log 2> scale_logs/bench_prewarm.log
echo "--- bench prewarm rc=$? $(date) ---" >> scale_logs/queue.log
echo "=== queue5 done $(date) ===" >> scale_logs/queue.log
