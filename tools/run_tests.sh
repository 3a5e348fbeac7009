#!/bin/bash
# Per-file test runner: one pytest process per test file.
#
# Why: long-lived XLA processes on this box intermittently SIGABRT in
# native code (~35-45 min in) whenever the remote-TPU plugin's tunnel
# relay is down — two different tests crashed that way in r2, both green
# in short processes. One process per file bounds the blast radius and
# makes the abort, if it still happens, attributable to a single file.
#
# Usage: tools/run_tests.sh [pytest-args...]   (runs tests/test_*.py)
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  echo "=== $f ==="
  python -m pytest "$f" -q "$@"
  rc=$?
  if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then   # 5 = no tests collected
    echo "FAILED: $f (rc=$rc)"
    fail=1
  fi
done
if [ $fail -eq 0 ]; then echo "ALL FILES PASSED"; else echo "SOME FILES FAILED"; fi
exit $fail
