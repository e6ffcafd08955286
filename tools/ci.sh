#!/bin/bash
# One-command round validation: compile, unit tests, smoke, sf0.01
# oracle gate, sf0.001 bench contract. Exit non-zero on any failure.
set -e
cd "$(dirname "$0")/.."

echo "== compile + test"
sbt -batch test 2>&1 | grep -E "Tests:|\*\*\*|error" | head -5

echo "== smoke (driver t1)"
tools/run.sh graft.Smoke 2>/dev/null | grep "entry rows"

echo "== correctness vs DuckDB oracle (driver t2 mirror, sf0.01)"
out=$(mktemp -d)
tools/run.sh graft.Verify /root/testdata/sf0.01 "$out" 2>/dev/null >/dev/null
python3 tools/check_oracle.py /root/testdata/sf0.01 "$out" 2>&1 | tail -1

echo "== bench JSON contract (sf0.001)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 tools/run.sh graft.Bench 2>/dev/null \
  | tail -1 | python3 -c "import json,sys; d=json.load(sys.stdin); print('total', round(d['value'],1), 'sec,', len(d['queries']), 'queries')"
