#!/bin/bash
# Push the servers/ subtree to a demo-hosting remote (the reference's
# push_space.sh flow, reference push_space.sh:1-28). The host only needs the
# serving code, not the full framework repo.
# Usage: ./push_space.sh [remote]   (default remote: space)
set -e

REMOTE=${1:-space}
TMP_BRANCH=_space-deploy-tmp

cleanup() {
    git branch -D "$TMP_BRANCH" >/dev/null 2>&1 || true
}
trap cleanup EXIT

echo "Splitting servers/ subtree..."
git branch -D "$TMP_BRANCH" >/dev/null 2>&1 || true
git subtree split --prefix servers -b "$TMP_BRANCH"

echo "Pushing to $REMOTE..."
if [ -n "${HF_TOKEN:-}" ]; then
    git -c credential.helper='!f() { echo username=__token__; echo password=$HF_TOKEN; }; f' \
        push "$REMOTE" "$TMP_BRANCH:main" --force
else
    git push "$REMOTE" "$TMP_BRANCH:main" --force
fi

echo "Done."
