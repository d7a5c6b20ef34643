#!/bin/bash
# Install the repo's git hooks. Run once per clone: tools/install-hooks.sh
set -euo pipefail
root="$(git rev-parse --show-toplevel)"
# resolve the hooks dir via git itself (worktrees keep hooks in the common
# gitdir, where a ../../tools relative symlink would dangle) and link with
# an absolute target
hooks="$(git rev-parse --git-path hooks)"
case "$hooks" in /*) ;; *) hooks="$root/$hooks" ;; esac
mkdir -p "$hooks"
ln -sf "$root/tools/precommit.sh" "$hooks/pre-commit"
chmod +x "$root/tools/precommit.sh"
echo "installed pre-commit -> tools/precommit.sh"
