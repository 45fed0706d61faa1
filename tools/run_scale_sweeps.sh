#!/usr/bin/env bash
# The standing volume-correctness recipe (SCALE.md "Correctness at scale"):
# run the full DuckDB-oracle gate at the synthetic 10x and 100x dirs.
#
#   bash tools/run_scale_sweeps.sh          # 10x (~20 min) + 100x
#   bash tools/run_scale_sweeps.sh 10x      # just the 10x tier
#
# Dirs are ensured by tools/scale_probe.py --build-only, invoked
# UNCONDITIONALLY (ADVICE r6: a bare dir-exists guard skipped the LAYOUT
# marker check, so a stale pre-v2 layout would be swept as-is); the build
# itself no-ops when src/replicas/layout match the marker.
#
# Both tiers run with SPARK_GRAFT_GATE_VIA_PARQUET=1 (VERDICT r6 #4):
# query outputs go to parquet sinks and DuckDB does the comparison, so
# the gate needs no driver collects — no maxResultSize override, and the
# default driver heap suffices at 100x (outputs past the pandas
# threshold never materialize on the driver at all).
set -euo pipefail
cd "$(dirname "$0")/.."

TIER="${1:-both}"
TEN=/tmp/spark_graft_scale/sf1_synth
HUNDRED=/tmp/spark_graft_scale/sf10_synth

if [ "$TIER" = "10x" ] || [ "$TIER" = "both" ]; then
  python tools/scale_probe.py --build-only >/dev/null
  echo "[scale-sweeps] 10x tier: $TEN"
  SPARK_GRAFT_GATE_VIA_PARQUET=1 \
    python tools/check_correctness.py "$TEN"
fi

if [ "$TIER" = "100x" ] || [ "$TIER" = "both" ]; then
  SPARK_GRAFT_SCALE_REPLICAS=100 SPARK_GRAFT_SCALE_DIR="$HUNDRED" \
    python tools/scale_probe.py --build-only >/dev/null
  echo "[scale-sweeps] 100x tier: $HUNDRED"
  SPARK_GRAFT_GATE_VIA_PARQUET=1 SPARK_GRAFT_DRIVER_MEM=16g \
    python tools/check_correctness.py "$HUNDRED"
fi
