#!/usr/bin/env bash
# Installs the pre-commit hook: runs tools/gate.sh when a commit touches
# streaming code (the family that rotted silently in round 1).
set -euo pipefail
cd "$(dirname "$0")/.."
cat > .git/hooks/pre-commit <<'HOOK'
#!/usr/bin/env bash
set -euo pipefail
if git diff --cached --name-only | grep -qE \
  'streaming/|streaming_like|sources/tables'; then
  echo "[pre-commit] streaming files changed - running tools/gate.sh"
  bash tools/gate.sh
fi
HOOK
chmod +x .git/hooks/pre-commit
echo "pre-commit hook installed"
