#!/bin/bash
# Time a comma-separated list of SparkEntry queries at a given SF dir.
# Usage: tools/time_queries.sh q_graph_pagerank,q_graph_triangles [sfDir] [passes]
#
# Gates run in CHUNKS of $CHUNK (default 24), one fresh JVM + SparkSession
# per chunk: the r13 full-suite sf1 sweep OOM'd a 16 GB driver on pass 2
# after ~96 warm gates of accumulated session state (cached blocks,
# localCheckpoint RDDs, persisted stream-static frames). Both passes of a
# chunk run inside its JVM, so per-gate warm semantics are unchanged; only
# cross-family state accumulation is gone. Set CHUNK=0 to restore the old
# single-JVM behavior.
set -e
QS="$1"
SF="${2:-/root/testdata/sf0.1}"
PASSES="${3:-2}"
CHUNK="${CHUNK:-24}"
cd "$(dirname "$0")/.."
OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do echo --add-opens java.base/$p=ALL-UNNAMED; done)

run_chunk() {
  local qs="$1"
  cat > /tmp/_timeq.scala <<EOF
import org.apache.spark.sql.SparkSession
val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
// spark-shell already made the session, so builder().config(...) would be
// IGNORED by getOrCreate: set the runtime confs on the live session or
// every timing here runs at shuffle.partitions=200 and reads ~2x slower
// than Bench's (the r17 diagnosis of why solo times never matched Bench).
val s2 = SparkSession.builder().getOrCreate()
s2.conf.set("spark.sql.shuffle.partitions", cpus)
s2.conf.set("spark.sql.adaptive.enabled", "true")
s2.conf.set("spark.sql.session.timeZone", "UTC")
s2.sparkContext.setLogLevel("WARN")
try { graft.SparkEntry.entry(s2).count() } catch { case _: Throwable => }
val names = "$qs".split(",").toSeq
for (p <- 1 to $PASSES; n <- names) {
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(n)(s2, "$SF").count()
  println(f"TIMING pass\$p \$n \${(System.nanoTime()-t0)/1e9}%.2f s")
  // caller contract of the projections registry: the gate's result is
  // consumed; without this, a 24-gate chunk JVM accumulates every pinned
  // projection and late gates degrade up to 10x (r16 sf0.1 sweep)
  graft.pipeline.Projections.release()
}
sys.exit(0)
EOF
  # run the pipeline with errexit SUSPENDED: under set -e, a JVM that dies
  # before emitting any TIMING line makes `grep` exit 1 and aborts the whole
  # script right here — no CHUNKFAIL line, remaining chunks never run
  # (ADVICE r14). Suspending errexit lets PIPESTATUS be inspected in every
  # failure shape: JVM dead after some TIMING lines (rc0!=0, rc1=0), JVM
  # dead before any (rc1=1), both.
  local rcs
  set +e
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" /opt/spark/bin/spark-shell \
    --master "local[${SPARK_GRAFT_CPUS:-32}]" --conf spark.ui.enabled=false \
    --conf spark.hadoop.fs.file.impl=graft.fs.NioLocalFileSystem \
    --driver-java-options "$(echo $OPENS) -Dspark.sql.session.timeZone=UTC" \
    --driver-memory 16g \
    --driver-class-path "target/scala-2.13/classes" -i /tmp/_timeq.scala 2>/dev/null \
    | grep TIMING
  rcs=("${PIPESTATUS[@]}")
  set -e
  if [ "${rcs[0]}" -ne 0 ] || [ "${rcs[1]}" -ne 0 ]; then
    echo "CHUNKFAIL rc=${rcs[0]} grep_rc=${rcs[1]} gates=$qs"
  fi
}

if [ "$CHUNK" -le 0 ]; then
  run_chunk "$QS"
else
  echo "$QS" | tr ',' '\n' | awk -v n="$CHUNK" '
    { buf = buf == "" ? $0 : buf "," $0; c++ }
    c == n { print buf; buf = ""; c = 0 }
    END { if (buf != "") print buf }' | while read -r chunk; do
    run_chunk "$chunk"
  done
fi
