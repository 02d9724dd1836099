#!/bin/bash
# Serial queue of the BASELINE config-3/4 + graph-at-1M scale runs
# (VERDICT r2 tasks 2 and 4). Each run appends one JSON line to
# SCALE_RUNS.jsonl; per-run timeouts keep one bad relay window from
# eating the whole budget. Logs land in scale_logs/ (gitignored).
set -u
cd /root/repo
mkdir -p scale_logs
echo "=== queue start $(date) ===" >> scale_logs/queue.log
run() {
  local name=$1 budget=$2; shift 2
  echo "--- $name (budget ${budget}s) $(date) ---" >> scale_logs/queue.log
  timeout "$budget" python -m vector_store_tpu.benchkit.scale "$name" \
    >> scale_logs/queue.log 2> "scale_logs/$name.log"
  echo "--- $name rc=$? $(date) ---" >> scale_logs/queue.log
}
run dbpedia-i8 5400
run dbpedia-bf16 4800
run deep10m 7200
SCALE_N=1000000 run graph 5400
run partition 3600
echo "=== queue done $(date) ===" >> scale_logs/queue.log
