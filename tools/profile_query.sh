#!/bin/bash
# Per-JOB profile of one or more SparkEntry queries: runs each query twice
# (pass1 cold-ish after the shared warmup, pass2 warm) with a SparkListener
# recording every job's duration, task count and task time, plus the wall
# split between plan CONSTRUCTION (the query builder, which for store/stream
# gates executes real ingest/build jobs) and the timed .count().
#
# Usage: tools/profile_query.sh q_name[,q_name...] [sfDir]
set -e
QS="$1"
SF="${2:-/root/testdata/sf0.1}"
cd "$(dirname "$0")/.."
OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do echo --add-opens java.base/$p=ALL-UNNAMED; done)

cat > /tmp/_profq.scala <<EOF
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
val s2 = SparkSession.builder().getOrCreate()
s2.conf.set("spark.sql.shuffle.partitions", cpus)
s2.conf.set("spark.sql.adaptive.enabled", "true")
s2.conf.set("spark.sql.session.timeZone", "UTC")
s2.sparkContext.setLogLevel("WARN")

case class J(id: Int, desc: String, var start: Long = 0, var end: Long = 0,
             var tasks: Int = 0, var taskMs: Long = 0)
val jobs = mutable.LinkedHashMap[Int, J]()
val stageToJob = mutable.HashMap[Int, Int]()
val listener = new SparkListener {
  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val d = Option(e.properties).map(_.getProperty("spark.job.description")).filter(_ != null)
      .orElse(Option(e.properties).map(_.getProperty("callSite.short")).filter(_ != null))
      .getOrElse("?")
    jobs.synchronized { jobs(e.jobId) = J(e.jobId, d, e.time)
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId) }
  }
  override def onJobEnd(e: SparkListenerJobEnd): Unit =
    jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
    stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
      j.tasks += 1
      if (e.taskInfo != null) j.taskMs += (e.taskInfo.finishTime - e.taskInfo.launchTime)
    }
  }
}
s2.sparkContext.addSparkListener(listener)

// shared warmup (same as Bench)
try { graft.SparkEntry.entry(s2).count() } catch { case _: Throwable => }
Thread.sleep(500)

val names = "$QS".split(",").toSeq
for (p <- 1 to 2; n <- names) {
  jobs.synchronized { jobs.clear(); stageToJob.clear() }
  val t0 = System.nanoTime()
  val df = graft.SparkEntry.queries(n)(s2, "$SF")
  val t1 = System.nanoTime()
  val cnt = df.count()
  val t2 = System.nanoTime()
  graft.pipeline.Projections.release()
  Thread.sleep(300) // let listener events drain
  println(f"PROFILE pass\$p \$n build=\${(t1-t0)/1e9}%.2f count=\${(t2-t1)/1e9}%.2f total=\${(t2-t0)/1e9}%.2f rows=\$cnt")
  val js = jobs.synchronized { jobs.values.toVector }
  println(f"PROFILE   jobs=\${js.size} jobWallSum=\${js.map(j => (j.end - j.start).max(0L)).sum / 1e3}%.2f taskSum=\${js.map(_.taskMs).sum / 1e3}%.2f tasks=\${js.map(_.tasks).sum}")
  js.sortBy(j => -(j.end - j.start)).take(14).foreach { j =>
    println(f"PROFILE   job \${j.id}%4d \${(j.end - j.start).max(0L) / 1e3}%7.2fs tasks=\${j.tasks}%4d taskS=\${j.taskMs / 1e3}%7.2f \${j.desc.take(110)}")
  }
}
sys.exit(0)
EOF

SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" /opt/spark/bin/spark-shell \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" --conf spark.ui.enabled=false \
    --conf spark.hadoop.fs.file.impl=graft.fs.NioLocalFileSystem \
    --conf spark.sql.codegen.cache.maxEntries=8192 \
  --driver-java-options "$(echo $OPENS) -Dspark.sql.session.timeZone=UTC" \
  --driver-memory 16g \
  --driver-class-path "target/scala-2.13/classes" -i /tmp/_profq.scala 2>/dev/null \
  | grep PROFILE
