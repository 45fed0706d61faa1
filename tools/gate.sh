#!/usr/bin/env bash
# Release gate (VERDICT r1 #5): the streaming family regressed silently in
# round 1, so stream/batch equivalence + the st* oracle sweep run before any
# end-of-round snapshot or bench publication.  The pre-commit hook
# (tools/install_hooks.sh) runs this automatically when streaming files
# change; run it manually before claiming "all green".
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/test_streaming.py -q
python -m pytest tests/test_oracle_equivalence.py -q -k \
  "st1 or st2 or st3 or st4 or st5 or st6 or st7 or st8 or st9 or st10"
