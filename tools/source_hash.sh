#!/usr/bin/env bash
# Content hash of everything the test suite exercises (working tree, since
# that is what pytest actually ran against).  Used by run_full_pytest.sh to
# stamp .fullpytest_ok and by the pre-commit hook to detect staleness.
set -euo pipefail
cd "$(dirname "$0")/.."
# Filter to files that exist: a tracked-but-deleted file would make
# sha256sum exit non-zero and silently kill the pre-commit hook with no
# BLOCKED message (the deletion also wasn't there when pytest ran, so
# excluding it keeps the hash consistent with what the suite saw).
# --others --exclude-standard: UNTRACKED source files count too — pytest
# imports them all the same, and hashing only tracked files made a
# brand-new module falsely STALE the moment it was git-added (and,
# worse, would keep the marker falsely FRESH if an untracked test the
# suite ran against were deleted before committing).
git ls-files --cached --others --exclude-standard \
    -- data_etl_scripts_showcase__spark tests __spark_entry__.py \
  | sort -u | while IFS= read -r f; do [ -f "$f" ] && printf '%s\n' "$f"; done \
  | xargs -r sha256sum | sha256sum | cut -d' ' -f1
