#!/usr/bin/env bash
# Full local certification gate — run before every round ends.
# Usage: tools/run_gates.sh [sfDir=/root/testdata/sf0.01]
# Mirrors the driver: ScalaTest, Verify dump, DuckDB value compare,
# oracle type lint, and a bench smoke. Exits non-zero on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/graft-gates.XXXX)"
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"

echo "== 1/5 compile + test"
sbt -batch test 2>&1 | tail -3

echo "== 2/5 verify dump ($SF)"
SPARK_GRAFT_CPUS=32 java -XX:ReservedCodeCacheSize=1g -cp "$CP" -Xmx24g \
  graft.Verify "$SF" "$OUT" 2>&1 | tail -1

echo "== 3/5 DuckDB value compare"
python3 tools/local_compare.py "$SF" "$OUT" | tail -1

echo "== 4/5 oracle type lint"
python3 tools/oracle_lint.py "$SF" "$OUT" | tail -1

echo "== 5/6 bench smoke (2 queries, metric line must be bare JSON)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench-smoke.json" \
  java -XX:ReservedCodeCacheSize=1g -cp "$CP" -Xmx8g \
  graft.Bench q01_scan_project q04_pricing_summary 2>/dev/null | tail -1 \
  | python3 -c "import json,sys; json.loads(sys.stdin.read()); print('metric line parses')"

echo "== 6/6 per-query regression gate (full sf0.1 bench vs last committed snapshot)"
# skippable for fast iteration loops: GRAFT_SKIP_BENCH_GATE=1 tools/run_gates.sh
if [ "${GRAFT_SKIP_BENCH_GATE:-0}" = "1" ]; then
  echo "bench regression gate SKIPPED (GRAFT_SKIP_BENCH_GATE=1)"
else
  BASELINE=$(ls bench-sf01-r*.json | sort -V | tail -1)
  echo "baseline: $BASELINE"
  python3 tools/bench_regress.py --baseline "$BASELINE" \
    --sf /root/testdata/sf0.1 --out "$OUT" | tail -12
fi

echo "== 7/7 resilience / skew / spill gates (skip: GRAFT_SKIP_CHAOS_GATE=1)"
if [ "${GRAFT_SKIP_CHAOS_GATE:-0}" = "1" ]; then
  echo "resilience gates SKIPPED (GRAFT_SKIP_CHAOS_GATE=1)"
else
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
    java -XX:ReservedCodeCacheSize=512m -cp "$CP" -Xmx4g \
    graft.tools.ChaosGate all 2>/dev/null | tail -6
  SPARK_GRAFT_CPUS=16 java -XX:ReservedCodeCacheSize=1g -cp "$CP" -Xmx24g \
    graft.tools.SkewGate all 2>/dev/null | tail -2
  SPARK_GRAFT_CPUS=8 java -XX:ReservedCodeCacheSize=512m -cp "$CP" -Xmx2g \
    graft.tools.SpillGate all 2>/dev/null | tail -3
  SPARK_GRAFT_CPUS=16 java -XX:ReservedCodeCacheSize=1g -cp "$CP" -Xmx24g \
    graft.tools.ConcurrencyGate all 2>/dev/null | tail -3
  SPARK_GRAFT_CPUS=16 java -XX:ReservedCodeCacheSize=1g -cp "$CP" -Xmx24g \
    graft.tools.StateMetricsGate all 2>/dev/null | tail -6
  SPARK_GRAFT_CPUS=8 java -XX:ReservedCodeCacheSize=512m -cp "$CP" -Xmx8g \
    graft.tools.DriverKillGate all 2>/dev/null | tail -3
fi

echo "ALL GATES GREEN ($OUT)"
