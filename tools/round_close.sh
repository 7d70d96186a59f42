#!/bin/bash
# Round-close gate — the r13 lesson made enforceable (VERDICT r14 item 5).
#
# Runs, IN ORDER, the full set of hard signals the driver will re-derive
# from the snapshot commit, and refuses to exit 0 on any red:
#   1. sbt compile            (a single uncompiled working-tree edit zeroed
#                              every signal of round 13)
#   2. sbt test               (full ScalaTest suite)
#   3. tools/verify_local.py  (FULL oracle gate at sf0.01 — every query)
#   4. graft.Bench            (sf0.1 composite; also refreshes
#                              bench/BENCH_FULL_LATEST.json)
#
# Usage: tools/round_close.sh [--skip-bench]
#   --skip-bench  drop step 4 (e.g. when the round's own clean bench was
#                 just recorded and only the correctness gates need re-proof)
set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_BENCH=0
[ "${1:-}" = "--skip-bench" ] && SKIP_BENCH=1

fail() { echo "ROUND-CLOSE RED: $1" >&2; exit 1; }

echo "== [1/4] sbt compile =="
sbt -batch compile || fail "compile"

echo "== [2/4] sbt test =="
sbt -batch test || fail "test suite"

echo "== [3/4] full oracle gate (sf0.01) =="
out=$(python3 tools/verify_local.py /root/testdata/sf0.01) || fail "verify_local crashed"
echo "$out" | tail -3
echo "$out" | grep -q "queries match" || fail "oracle gate (mismatches above)"
echo "$out" | grep -qE "MISMATCH|FAIL" && fail "oracle gate (mismatches above)"

if [ "$SKIP_BENCH" -eq 1 ]; then
  echo "== [4/4] bench SKIPPED (--skip-bench) =="
else
  echo "== [4/4] bench (sf0.1) =="
  OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch \
    sun.nio.cs sun.security.action sun.util.calendar; do \
    echo --add-opens java.base/$p=ALL-UNNAMED; done)
  # parse THIS run's stdout (the full-precision line is printed first) —
  # validating bench/BENCH_FULL_LATEST.json would silently grade a STALE
  # file if the write failed (Bench wraps file writes in Try by design)
  BOUT=$(mktemp)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    java $OPENS -Xmx16g -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    > "$BOUT" || fail "bench run"
  tail -1 "$BOUT"
  # the full-precision line is the first {"metric"... line WITHOUT the
  # compact line's queries_full pointer (robust to stray stdout noise)
  grep -v '"queries_full"' "$BOUT" | grep -m1 '^{"metric"' \
    | python3 -c "import json,sys; d=json.load(sys.stdin); \
assert not d['failed_queries'], d['failed_queries']; \
print('bench composite %.1f s, %d queries, contended=%s' % \
(d['value'], len(d['queries']), d['contended']))" || fail "bench had failed queries"
  # calibration-normalized watchlines (VERDICT r15 #4): host drift is a
  # division now, not a stash-A/B afternoon; a breach is new territory
  STAMPED=$(grep -m1 '"queries_full"' "$BOUT" \
    | python3 -c "import json,sys; print(json.load(sys.stdin)['queries_full'])")
  python3 tools/check_watchlines.py "$STAMPED" \
    || fail "watchline breach (adjudicate or fix; see table above)"
  rm -f "$BOUT"
fi

# recorded bench tables are append-only history (VERDICT r15 #5): a Bench
# run may CREATE stamped files and overwrite only the LATEST pointer —
# any tracked bench artifact showing as modified means something clobbered
# recorded data
MODIFIED=$(git status --porcelain bench/ | grep -E '^ ?M' \
  | grep -v 'BENCH_FULL_LATEST.json' || true)
[ -z "$MODIFIED" ] || fail "tracked bench artifact modified (write-once violated): $MODIFIED"

echo "ROUND-CLOSE GREEN: all gates passed"
