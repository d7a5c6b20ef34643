#!/bin/bash
# Install the repo's git hooks. Run once per clone: tools/install-hooks.sh
set -euo pipefail
root="$(git rev-parse --show-toplevel)"
ln -sf ../../tools/precommit.sh "$root/.git/hooks/pre-commit"
chmod +x "$root/tools/precommit.sh"
echo "installed pre-commit -> tools/precommit.sh"
