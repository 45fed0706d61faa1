#!/usr/bin/env bash
# Content hash of everything the test suite exercises (working tree, since
# that is what pytest actually ran against).  Used by run_full_pytest.sh to
# stamp .fullpytest_ok and by the pre-commit hook to detect staleness.
set -euo pipefail
cd "$(dirname "$0")/.."
git ls-files -- data_etl_scripts_showcase__spark tests __spark_entry__.py \
  | sort | xargs sha256sum 2>/dev/null | sha256sum | cut -d' ' -f1
