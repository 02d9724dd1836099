#!/bin/bash
# Round-4 measurement queue (VERDICT r3 orders #4, #5, #7, #8):
#   partition  - small-batch local-index regime (b8) at 1M
#   glove      - BASELINE config 2 at spec scale (1.2M x 100-d, nprobe sweep)
#   graph      - graph-at-1M refresh + chained-forced compute-side QPS
#   streaming  - config 5 at 1M: QPS under churn + mid-run rebuild + freshness
#   filtered   - selectivity buckets through the serving path at 1M
# Waits for the relay before each run; per-run timeouts bound outages.
set -u
cd /root/repo
mkdir -p scale_logs
echo "=== queue-r4 start $(date) ===" >> scale_logs/queue.log
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
    >> scale_logs/queue.log 2> "scale_logs/$name.r4.log"
  echo "--- $name rc=$? $(date) ---" >> scale_logs/queue.log
}
run partition 4200
run glove 5400
run graph 5400
run streaming 4200
run filtered 6000
echo "=== queue-r4 done $(date) ===" >> scale_logs/queue.log
