package graft

import java.nio.file.attribute.PosixFilePermission._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The no-fork local filesystem ([[graft.fs.NioLocalFileSystem]]) must be
  * byte-for-byte LocalFileSystem except that permission application uses
  * chmod(2) directly instead of forking `chmod` — these pin the permission
  * semantics and the end-to-end write/read path under the swapped fs. The
  * whole suite additionally runs through it (SparkTestSession sets
  * `fs.file.impl`), which is the broad integration coverage. */
class NioLocalFileSystemSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("toPosix maps all nine permission bits like chmod would") {
    import graft.fs.NioLocalFileSystem.toPosix
    assert(toPosix(0x1ff.toShort) == java.util.EnumSet.allOf(classOf[java.nio.file.attribute.PosixFilePermission]))
    assert(toPosix(0.toShort).isEmpty)
    val rw_r__r__ = toPosix(Integer.parseInt("644", 8).toShort)
    assert(rw_r__r__ == java.util.EnumSet.of(OWNER_READ, OWNER_WRITE, GROUP_READ, OTHERS_READ))
    val rwxr_x___ = toPosix(Integer.parseInt("750", 8).toShort)
    assert(rwxr_x___ == java.util.EnumSet.of(
      OWNER_READ, OWNER_WRITE, OWNER_EXECUTE, GROUP_READ, GROUP_EXECUTE))
  }

  test("the session's file:// filesystem IS the nio one, and setPermission lands") {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path("/tmp").getFileSystem(conf)
    assert(fs.isInstanceOf[graft.fs.NioLocalFileSystem],
      s"fs.file.impl not in effect: ${fs.getClass}")
    // parquet round-trip through the swapped fs (create + .crc + rename +
    // mkdirs all exercised), then an explicit setPermission
    val dir = java.nio.file.Files.createTempDirectory("graft_niofs_").toString
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite").parquet(s"$dir/t")
      assert(spark.read.parquet(s"$dir/t").count() == 2)
      val p = new org.apache.hadoop.fs.Path(s"$dir/t/_SUCCESS")
      fs.setPermission(p, new org.apache.hadoop.fs.permission.FsPermission("600"))
      val got = java.nio.file.Files.getPosixFilePermissions(
        java.nio.file.Paths.get(s"$dir/t/_SUCCESS"))
      assert(got == java.util.EnumSet.of(OWNER_READ, OWNER_WRITE), got.toString)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
