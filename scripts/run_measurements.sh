#!/bin/bash
# Sequential TPU measurement queue for the round-3 re-measurement (VERDICT
# item 1). One job at a time — concurrent clients serialize on the axon
# tunnel and mid-compile kills can wedge the remote server, so everything
# runs with generous timeouts and NO overlap.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/measure}
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$LOG/queue.log"
  timeout "$TMO" "$@" > "$LOG/$name.log" 2>&1
  echo "    exit $? ($(date +%H:%M:%S))" | tee -a "$LOG/queue.log"
}

TMO=1800 run bench            python bench.py
TMO=1800 run e2e48            python scripts/bench_pipeline.py --runs 2
TMO=1800 run e2e48_uncalib    python scripts/bench_pipeline.py --uncalibrated --runs 2
TMO=2700 run e2e256           python scripts/bench_pipeline.py --frames 256 --matching windows --runs 2
TMO=1800 run panorama         python scripts/bench_panorama.py --frames 32 --pano-width 2048 --nphi 5
TMO=2700 run eval_suite       python scripts/eval_suite.py
TMO=1800 run roofline         python scripts/roofline.py
echo "ALL DONE $(date +%H:%M:%S)" | tee -a "$LOG/queue.log"
