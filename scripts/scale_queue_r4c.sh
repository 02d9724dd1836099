#!/bin/bash
# Round-4 third measurement pass:
#   filtered  - re-run at 1M through the NEW grouped terminal path
#               (restriction-signature ladder/match caches + subset-exact
#               scans; first r4 run recorded 2-6 QPS on per-query
#               full-table terminals)
#   streaming - re-run with per-phase time attribution (query/upsert/
#               remove/freshness/maintain) to attribute the 279 upserts/s
# Waits for the relay before each run; per-run timeouts bound outages.
set -u
cd /root/repo
mkdir -p scale_logs
echo "=== queue-r4c start $(date) ===" >> scale_logs/queue.log
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
    >> scale_logs/queue.log 2> "scale_logs/$name.r4c.log"
  echo "--- $name rc=$? $(date) ---" >> scale_logs/queue.log
}
run filtered 7200
run streaming 4200
echo "=== queue-r4c done $(date) ===" >> scale_logs/queue.log
