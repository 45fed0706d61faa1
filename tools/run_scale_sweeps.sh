#!/usr/bin/env bash
# The standing volume-correctness recipe (SCALE.md "Correctness at scale"):
# run the full DuckDB-oracle gate at the synthetic 10x and 100x dirs.
#
#   bash tools/run_scale_sweeps.sh          # 10x (~20 min) + 100x
#   bash tools/run_scale_sweeps.sh 10x      # just the 10x tier
#   bash tools/run_scale_sweeps.sh longdocs # doc-LENGTH axis (x32 + x128)
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
  SPARK_GRAFT_GATE_VIA_PARQUET=1 \
    python tools/check_correctness.py "$HUNDRED"
fi

# Doc-LENGTH axis (VERDICT r6 #2): every row-count tier replicates
# documents; this one lengthens them, so super-linear-in-length costs
# (the round-7 CDC lesson) can never hide behind row-count scaling.
# Timing probe at x32 and x128 over the length-sensitive families, plus
# the value-exact oracle gate for the chunk family at the x32 tier.
if [ "$TIER" = "longdocs" ]; then
  SPARK_GRAFT_LONGDOC_MULT=32 python tools/scale_probe.py --longdocs
  SPARK_GRAFT_LONGDOC_MULT=128 python tools/scale_probe.py --longdocs
  python tools/check_correctness.py /tmp/spark_graft_scale/longdocs_L32 \
    t25_content_defined_chunks x48_chunk_dedup_ratio
fi
