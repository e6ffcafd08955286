#!/bin/bash
# Calm bench record runs (BASELINE.md bookkeeping): waits for the 1-min
# load to settle, then runs the segmented bench at both SFs with the
# details redirected to the COMMITTED record files. Run alone on a calm
# box; the printed contract lines carry load_avg_start for adjudication.
set -eu
cd "$(dirname "$0")/.."
wait_calm() {
  for _ in $(seq 1 60); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" 'BEGIN{exit !(l < 1.0)}' && return 0
    sleep 10
  done
  echo "WARN: load never settled below 1.0" >&2
}
echo "== sf0.001 record"
wait_calm
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  SPARK_GRAFT_BENCH_DETAILS=bench_details.json \
  tools/run.sh graft.Bench 2>/dev/null | tail -1
echo "== sf0.1 record"
wait_calm
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_DETAILS=bench_details_sf01.json \
  tools/run.sh graft.Bench 2>/dev/null | tail -1
