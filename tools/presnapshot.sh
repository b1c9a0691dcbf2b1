#!/usr/bin/env bash
# Pre-snapshot gate: refuse to end a round on a tree that doesn't
# compile. Round 8's entire evidence (CORRECTNESS_r08 + BENCH_r08) was
# voided by a single uncompiled call site swept into the final snapshot
# commit — this script is the cheap insurance against a repeat.
#
# Usage:  tools/presnapshot.sh           # compile gate only (fast, ~10 s warm)
#         tools/presnapshot.sh --test    # compile + full ScalaTest suite
#
# Run it before ANY end-of-round state and before any commit that
# touches main sources. Exit 0 = safe to snapshot.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[presnapshot] sbt compile + Test/compile ..."
sbt -batch compile "Test/compile" >/tmp/presnapshot_compile.log 2>&1 || {
  echo "[presnapshot] COMPILE FAILED — do NOT snapshot. Tail:"
  tail -30 /tmp/presnapshot_compile.log
  exit 1
}
echo "[presnapshot] compile green."

if [[ "${1:-}" == "--test" ]]; then
  echo "[presnapshot] sbt test ..."
  sbt -batch test >/tmp/presnapshot_test.log 2>&1 || {
    echo "[presnapshot] TESTS FAILED — do NOT snapshot. Tail:"
    tail -40 /tmp/presnapshot_test.log
    exit 1
  }
  echo "[presnapshot] tests green."
fi
echo "[presnapshot] OK to snapshot."
