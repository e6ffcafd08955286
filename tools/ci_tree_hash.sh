#!/bin/bash
# Deterministic hash of the validated tree: every tracked/untracked file
# under src/ plus the build definition, content-hashed in sorted-path
# order. tools/ci.sh writes this to .git/graft-ci-green on a green run;
# the pre-commit hook recomputes it to decide whether the src/ tree being
# committed is the one the full gate validated.
set -eu
cd "$(git rev-parse --show-toplevel)"
# NUL-delimited end to end: a path with whitespace must hash as ONE
# argument, not split into garbage (ADVICE r10).
{ git ls-files -z -co --exclude-standard src; printf 'build.sbt\0'; } \
  | sort -z | xargs -0 sha256sum | sha256sum | cut -d' ' -f1
