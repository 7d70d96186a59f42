package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZOrder

/** Z-order clustering: bit-exact interleave semantics and the layout
  * property that justifies it — file-level min-max stats prune narrow
  * predicates on BOTH clustered columns, where a single-column sort prunes
  * only its own. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("interleave16 places a's bits at even and b's at odd positions") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFL, 0L), (0L, 0xFFFFL),
      (0xABCDL, 0x1234L)).toDF("a", "b")
    val out = rows.select(col("a"), col("b"),
      ZOrder.interleave16(col("a"), col("b")).as("z")).collect()
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))).reduce(_ | _)
    out.foreach { r =>
      assert(r.getAs[Long]("z") == morton(r.getAs[Long]("a"), r.getAs[Long]("b")))
    }
  }

  test("z-order files prune narrow predicates on BOTH columns; a-sort prunes only a") {
    import spark.implicits._
    val n = 4096
    // a is sequential, b is an independent md5-derived value in [0, 4096)
    val df = (0 until n).map { i =>
      (i.toLong, Math.floorMod(graft.pipeline.Hashing.md5LongJvm(s"zb$i"), 4096L))
    }.toDF("a", "b")

    def fileRanges(write: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
      write.write.mode("overwrite").parquet(dir)
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("a"), max("a"), min("b"), max("b")).head
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }
    def overlapping(ranges: Seq[(Long, Long, Long, Long)], onA: Boolean,
        lo: Long, hi: Long): Int =
      ranges.count { case (a0, a1, b0, b1) =>
        if (onA) a0 <= hi && a1 >= lo else b0 <= hi && b1 >= lo
      }

    val z = fileRanges(ZOrder.clusterByZOrder(df, "a", "b", numFiles = 16))
    assert(z.size >= 12, s"expected ~16 files, got ${z.size}")
    // a 1/16-wide slice of either dimension, placed INSIDE a quadrant (a
    // slice straddling the top-bit boundary touches twice the rectangles —
    // the curve's known worst case), touches a minority of files
    val za = overlapping(z, onA = true, 1300, 1555)
    val zb = overlapping(z, onA = false, 1300, 1555)
    assert(za <= (z.size * 5) / 8, s"z-order: a-slice should prune, touched $za/${z.size}")
    assert(zb <= (z.size * 5) / 8, s"z-order: b-slice should prune, touched $zb/${z.size}")

    // single-column sort: perfect on a, useless on b
    val s = fileRanges(df.repartitionByRange(16, col("a")).sortWithinPartitions("a"))
    val sa = overlapping(s, onA = true, 1300, 1555)
    val sb = overlapping(s, onA = false, 1300, 1555)
    assert(sa <= 2, s"a-sort: a-slice should touch ~1 file, touched $sa")
    assert(sb >= s.size - 1, s"a-sort: b-slice should touch every file, touched $sb/${s.size}")
  }
}
