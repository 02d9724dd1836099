#!/bin/bash
# Round-4 second measurement pass:
#   graph      - search_iters walk-down (fewer serialized gather rounds) +
#                compute-side at the capped iters
#   glove      - config 2 re-run through the oversample+rescore gate walk
#                (first run plateaued at 0.944 across nprobe 8->512)
#   streaming  - config 5 re-run with 2048-row churn batches (first run's
#                256-row batches were relay-fixed-cost-bound at ~50 rows/s)
#   dbpedia-bf16 / dbpedia-i8 - build-rate pass with dataset generation
#                outside the ingest timer (VERDICT r3 #9)
# Waits for the relay before each run; per-run timeouts bound outages.
set -u
cd /root/repo
mkdir -p scale_logs
echo "=== queue-r4b start $(date) ===" >> scale_logs/queue.log
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
    >> scale_logs/queue.log 2> "scale_logs/$name.r4b.log"
  echo "--- $name rc=$? $(date) ---" >> scale_logs/queue.log
}
run graph 5400
run glove 5400
run streaming 4200
run dbpedia-bf16 5400
run dbpedia-i8 5400
echo "=== queue-r4b done $(date) ===" >> scale_logs/queue.log
