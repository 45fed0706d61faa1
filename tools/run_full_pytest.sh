#!/usr/bin/env bash
# Full-suite run + freshness marker (VERDICT r4 #2: round 4's snapshot
# shipped with 2 failing unit tests because the full suite wasn't re-run
# after a 16-call-site refactor — make the check mechanical, not a habit).
#
# On success writes .fullpytest_ok with the source-tree content hash the
# suite ran against; the pre-commit hook (tools/install_hooks.sh) refuses
# source-touching commits whose current tree hash differs from the marker,
# unless explicitly overridden with ALLOW_STALE_PYTEST=1 (WIP commits).
set -euo pipefail
cd "$(dirname "$0")/.."

hash="$(bash tools/source_hash.sh)"
start=$(date +%s)
python -m pytest tests/ -q | tee /tmp/fullpytest.log
dur=$(( $(date +%s) - start ))
tail=$(grep -E "passed|failed" /tmp/fullpytest.log | tail -1)

{
  echo "source_hash=$hash"
  echo "finished_utc=$(date -u +%FT%TZ)"
  echo "duration_s=$dur"
  echo "result=$tail"
} > .fullpytest_ok
echo "[full-pytest] marker written: $tail (${dur}s)"
