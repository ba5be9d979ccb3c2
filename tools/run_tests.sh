#!/usr/bin/env bash
# Per-file test runner: isolates each test file in its own process.
#
# Why: the FULL single-process suite deterministically segfaults inside
# XLA:CPU during tests/test_paged.py::test_paged_forward_matches_flat once
# ~170 jitted programs from earlier files have accumulated (r4, quiet
# machine, 125 GB free — not memory pressure; the same file passes alone
# and in 3-file combinations). Per-file processes sidestep whatever
# compile-cache state triggers it and give the same coverage.
#
#   bash tools/run_tests.sh [extra pytest args]
set -u
fail=0
for f in tests/test_*.py; do
  echo "=== $f"
  python -m pytest "$f" -q -p no:cacheprovider "$@" || fail=1
done
exit $fail
