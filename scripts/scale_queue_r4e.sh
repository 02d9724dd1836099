#!/bin/bash
# Round-4 fifth pass: bench.py end-to-end check (weather-proof headline +
# retrying relay probe), then the two runs the r4d pass lost to an
# edit/run race: streaming at 8192-row churn windows and filtered with the
# per-bucket warmup.
set -u
cd /root/repo
mkdir -p scale_logs
echo "=== queue-r4e start $(date) ===" >> scale_logs/queue.log
wait_relay() {
  until timeout 90 python -c "import jax; jax.numpy.ones(4).sum()" >/dev/null 2>&1; do
    echo "relay dark $(date)" >> scale_logs/queue.log
    sleep 240
  done
  echo "relay up $(date)" >> scale_logs/queue.log
}
wait_relay
echo "--- bench check $(date) ---" >> scale_logs/queue.log
timeout 3600 python bench.py > scale_logs/bench.r4e.json 2> scale_logs/bench.r4e.log
echo "--- bench rc=$? $(date) ---" >> scale_logs/queue.log
run() {
  local name=$1 budget=$2; shift 2
  wait_relay
  echo "--- $name (budget ${budget}s, $*) $(date) ---" >> scale_logs/queue.log
  env "$@" timeout "$budget" python -m vector_store_tpu.benchkit.scale "$name" \
    >> scale_logs/queue.log 2> "scale_logs/$name.r4e.log"
  echo "--- $name rc=$? $(date) ---" >> scale_logs/queue.log
}
run streaming 4200 SCALE_CHURN_BATCH=8192
run filtered 7200 FOO=1
echo "=== queue-r4e done $(date) ===" >> scale_logs/queue.log
