#!/bin/bash
# Round-4 fourth measurement pass:
#   partition @4M  - the small-batch local-index win scales with N at fixed
#                    partition size (~976 rows): full scan pays O(N) per
#                    batch, the directory kernel O(B*pmax). At 1M the ratio
#                    measured 5.4x (kernel dispatch floor ~87us vs scan
#                    ~470us); at 4M the scan cost quadruples.
#   streaming      - drive churn at 8192 rows/window (the upsert path
#                    absorbs ~11.8k rows/s; the 437.8/s record was the
#                    bench's drive rate, not a ceiling)
#   filtered       - re-run with the per-bucket warmup pass so the timed
#                    window measures steady state, not first-contact
#                    compiles through the relay
# Waits for any in-flight bench check, then for the relay, before each run.
set -u
cd /root/repo
mkdir -p scale_logs
echo "=== queue-r4d start $(date) ===" >> scale_logs/queue.log
if [ -f /tmp/bench_check.pid ]; then
  while [ -d "/proc/$(cat /tmp/bench_check.pid)" ]; do sleep 30; done
fi
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
  echo "--- $name (budget ${budget}s, $*) $(date) ---" >> scale_logs/queue.log
  env "$@" timeout "$budget" python -m vector_store_tpu.benchkit.scale "$name" \
    >> scale_logs/queue.log 2> "scale_logs/$name.r4d.log"
  echo "--- $name rc=$? $(date) ---" >> scale_logs/queue.log
}
run partition 4800 SCALE_N=4000000
run streaming 4200 SCALE_CHURN_BATCH=8192
run filtered 7200 FOO=1
echo "=== queue-r4d done $(date) ===" >> scale_logs/queue.log
