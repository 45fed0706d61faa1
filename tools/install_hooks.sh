#!/usr/bin/env bash
# Installs the pre-commit hook:
#   1. runs tools/gate.sh when a commit touches streaming code (the family
#      that rotted silently in round 1);
#   2. blocks source-touching commits whose tree no longer matches the
#      .fullpytest_ok marker (VERDICT r4 #2: round 4 shipped a snapshot with
#      2 failing unit tests).  Refresh with tools/run_full_pytest.sh, or
#      acknowledge a WIP commit explicitly with ALLOW_STALE_PYTEST=1.
set -euo pipefail
cd "$(dirname "$0")/.."
cat > .git/hooks/pre-commit <<'HOOK'
#!/usr/bin/env bash
set -euo pipefail
staged="$(git diff --cached --name-only)"
if echo "$staged" | grep -qE 'streaming/|streaming_like|sources/tables'; then
  echo "[pre-commit] streaming files changed - running tools/gate.sh"
  bash tools/gate.sh
fi
if echo "$staged" | grep -qE \
  '^(data_etl_scripts_showcase__spark/|tests/|__spark_entry__\.py)'; then
  if [ "${ALLOW_STALE_PYTEST:-0}" = "1" ]; then
    echo "[pre-commit] ALLOW_STALE_PYTEST=1 - skipping full-pytest freshness check"
  else
    want="$(bash tools/source_hash.sh)"
    have="$(grep -oP '(?<=^source_hash=).*' .fullpytest_ok 2>/dev/null || true)"
    if [ "$want" != "$have" ]; then
      echo "[pre-commit] BLOCKED: source changed since the last full pytest run."
      echo "  Run: bash tools/run_full_pytest.sh   (refreshes .fullpytest_ok)"
      echo "  Or for a WIP milestone commit: ALLOW_STALE_PYTEST=1 git commit ..."
      exit 1
    fi
    # PLANS.md must be generated from the same tree (VERDICT r9 #1: the
    # published plan document contradicted the shipped plans for a round).
    plans_stamp="$(grep -oP '(?<=<!-- source_hash: )[0-9a-f]+' PLANS.md 2>/dev/null || true)"
    if [ "$want" != "$plans_stamp" ]; then
      echo "[pre-commit] BLOCKED: PLANS.md was generated from a different source tree."
      echo "  Run: bash tools/run_full_pytest.sh   (regenerates + stamps PLANS.md)"
      echo "  Or just: python tools/gen_plans.py"
      echo "  Or for a WIP milestone commit: ALLOW_STALE_PYTEST=1 git commit ..."
      exit 1
    fi
    # The marker hashes the WORKING TREE (what pytest ran against) but the
    # commit records the INDEX.  If unstaged edits touch gated paths, the
    # staged tree is NOT the tree the suite validated - block that too.
    # untracked files are invisible to `git diff` but pytest imported
    # them — an untracked module under the gated paths means the COMMITTED
    # tree was never validated (ADVICE r5)
    unstaged="$(git diff --name-only -- data_etl_scripts_showcase__spark \
      tests __spark_entry__.py; \
      git ls-files --others --exclude-standard -- \
      data_etl_scripts_showcase__spark tests __spark_entry__.py)"
    if [ -n "$unstaged" ]; then
      echo "[pre-commit] BLOCKED: unstaged/untracked source files mean the"
      echo "  staged tree differs from the tree the full suite ran against:"
      echo "$unstaged" | sed 's/^/    /'
      echo "  Stage everything you tested, or ALLOW_STALE_PYTEST=1 for WIP."
      exit 1
    fi
    echo "[pre-commit] full-pytest marker fresh ($(grep '^result=' .fullpytest_ok | cut -d= -f2-))"
  fi
fi
HOOK
chmod +x .git/hooks/pre-commit
echo "pre-commit hook installed"
