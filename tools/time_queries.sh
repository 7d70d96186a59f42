#!/bin/bash
# Time a comma-separated list of SparkEntry queries at a given SF dir.
# Usage: tools/time_queries.sh q_graph_pagerank,q_graph_triangles [sfDir] [passes]
set -e
QS="$1"
SF="${2:-/root/testdata/sf0.1}"
PASSES="${3:-2}"
cd "$(dirname "$0")/.."
OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do echo --add-opens java.base/$p=ALL-UNNAMED; done)
cat > /tmp/_timeq.scala <<EOF
import org.apache.spark.sql.SparkSession
val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
val s2 = SparkSession.builder().master(s"local[\$cpus]")
  .config("spark.sql.shuffle.partitions", cpus)
  .config("spark.sql.adaptive.enabled", "true")
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.ui.enabled", "false").getOrCreate()
s2.sparkContext.setLogLevel("WARN")
try { graft.SparkEntry.entry(s2).count() } catch { case _: Throwable => }
val names = "$QS".split(",").toSeq
for (p <- 1 to $PASSES; n <- names) {
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(n)(s2, "$SF").count()
  println(f"TIMING pass\$p \$n \${(System.nanoTime()-t0)/1e9}%.2f s")
}
sys.exit(0)
EOF
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" /opt/spark/bin/spark-shell \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" --conf spark.ui.enabled=false \
  --driver-java-options "$(echo $OPENS) -Dspark.sql.session.timeZone=UTC" \
  --driver-memory 16g \
  --driver-class-path "target/scala-2.13/classes" -i /tmp/_timeq.scala 2>/dev/null \
  | grep TIMING
