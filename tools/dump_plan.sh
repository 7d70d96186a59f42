#!/bin/bash
# Dump .explain("formatted") for one or more SparkEntry queries to files:
#   tools/dump_plan.sh q_a[,q_b...] OUTDIR [SUFFIX] [sfDir]
# writes OUTDIR/<query><SUFFIX>.txt for each query.
set -e
QS="$1"
OUT="$2"
SUF="${3:-}"
SF="${4:-/root/testdata/sf0.1}"
cd "$(dirname "$0")/.."
mkdir -p "$OUT"
OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do echo --add-opens java.base/$p=ALL-UNNAMED; done)

cat > /tmp/_dumpplan.scala <<EOF
import org.apache.spark.sql.SparkSession
val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
val s2 = SparkSession.builder().getOrCreate()
s2.conf.set("spark.sql.shuffle.partitions", cpus)
s2.conf.set("spark.sql.adaptive.enabled", "true")
s2.conf.set("spark.sql.session.timeZone", "UTC")
s2.sparkContext.setLogLevel("ERROR")
val names = "$QS".split(",").toSeq
for (n <- names) {
  val df = graft.SparkEntry.queries(n)(s2, "$SF")
  val plan = df.queryExecution.explainString(
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  java.nio.file.Files.write(java.nio.file.Paths.get(s"$OUT/" + n + "$SUF.txt"),
    plan.getBytes("UTF-8"))
  println(s"WROTE $OUT/" + n + "$SUF.txt")
  graft.pipeline.Projections.release()
}
sys.exit(0)
EOF

SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" /opt/spark/bin/spark-shell \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" --conf spark.ui.enabled=false \
  --conf spark.hadoop.fs.file.impl=graft.fs.NioLocalFileSystem \
    --conf spark.sql.codegen.cache.maxEntries=8192 \
  --driver-java-options "$(echo $OPENS) -Dspark.sql.session.timeZone=UTC" \
  --driver-memory 16g \
  --driver-class-path "target/scala-2.13/classes" -i /tmp/_dumpplan.scala 2>/dev/null \
  | grep WROTE
