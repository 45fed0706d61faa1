#!/usr/bin/env bash
# The standing volume-correctness recipe (SCALE.md "Correctness at scale"):
# run the full DuckDB-oracle gate at the synthetic 10x and 100x dirs.
#
#   bash tools/run_scale_sweeps.sh          # 10x (~20 min) + 100x (~2.5 h)
#   bash tools/run_scale_sweeps.sh 10x      # just the 10x tier
#
# Dirs are built on demand by tools/scale_probe.py (layout-versioned — a
# LAYOUT bump in scale_probe.py forces rebuilds).  The 100x tier NEEDS the
# driver sizing below: the gate collects FULL query outputs to compare
# them (60M-row collects exceed Spark's 1g maxResultSize), and the JVM
# needs heap headroom for them (the sweep drops consumed memory-sink
# tables, but individual collects are still multi-GB).
set -euo pipefail
cd "$(dirname "$0")/.."

TIER="${1:-both}"
TEN=/tmp/spark_graft_scale/sf1_synth
HUNDRED=/tmp/spark_graft_scale/sf10_synth

if [ "$TIER" = "10x" ] || [ "$TIER" = "both" ]; then
  [ -d "$TEN/lineitem.parquet" ] || python tools/scale_probe.py d1_exact_dedup >/dev/null
  echo "[scale-sweeps] 10x tier: $TEN"
  SPARK_GRAFT_DRIVER_MEM=16g SPARK_GRAFT_MAX_RESULT=8g \
    python tools/check_correctness.py "$TEN"
fi

if [ "$TIER" = "100x" ] || [ "$TIER" = "both" ]; then
  [ -d "$HUNDRED/lineitem.parquet" ] || \
    SPARK_GRAFT_SCALE_REPLICAS=100 SPARK_GRAFT_SCALE_DIR="$HUNDRED" \
    python tools/scale_probe.py d1_exact_dedup >/dev/null
  echo "[scale-sweeps] 100x tier: $HUNDRED"
  SPARK_GRAFT_DRIVER_MEM=32g SPARK_GRAFT_MAX_RESULT=12g \
    python tools/check_correctness.py "$HUNDRED"
fi
