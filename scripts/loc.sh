#!/bin/sh
# Canonical line-count used by DESIGN.md / round reviews (ADVICE r2 #3:
# the headline LoC figure must be reproducible from a committed command).
#
#   scripts/loc.sh            -> non-test source LoC (package + runtime + cli)
#   scripts/loc.sh --tests    -> test LoC
#
# "Non-test source" = *.py under dynibar_tpu/ and scripts/ plus native
# sources under runtime/, excluding any path containing "test".
set -e
cd "$(dirname "$0")/.."
if [ "$1" = "--tests" ]; then
  find tests -name '*.py' | sort | xargs wc -l | tail -1
else
  find dynibar_tpu scripts runtime \
      \( -name '*.py' -o -name '*.cc' -o -name '*.c' -o -name '*.h' \) \
      ! -path '*test*' | sort | xargs wc -l | tail -1
fi
