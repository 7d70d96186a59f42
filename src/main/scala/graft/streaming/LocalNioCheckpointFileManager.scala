package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path}
import org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager

/** Checkpoint file manager for PROCESS-LOCAL (file://) checkpoint dirs that
  * never forks a subprocess.
  *
  * Why it exists (r19 profiling): without the libhadoop native library —
  * the normal state of a bare Spark install — Hadoop's local filesystems
  * shell out for metadata operations, so EVERY checkpoint file paid
  * fork+exec of the multi-GB JVM, twice over:
  *
  *  - the default FileContext manager's `rename` calls `getFileLinkStatus`
  *    → `FileUtil.readLink` → `Shell.execCommand("readlink")` per renamed
  *    file (jstack'd during q_stream_join's 3.2–17.9 s wall-time swings);
  *  - the FileSystem manager's `create`/`mkdirs` apply an `FsPermission`
  *    → `RawLocalFileSystem.setPermission` → `Shell.execCommand("chmod")`
  *    per created file — doubled by ChecksumFileSystem's `.crc` sidecars.
  *
  * Fork latency scales with the parent's RSS and host memory pressure
  * (10 µs – 100+ ms each), which is precisely the "IO weather" spread the
  * r18 watchlines carried on the checkpoint-writing gates: state deltas ×
  * partitions × stores + offsets + commits + checksum siblings, each a
  * potential fork stall.
  *
  * This subclass reroutes the three forking operations through java.nio
  * (`FileOutputStream` create, `Files.move` ATOMIC_MOVE rename,
  * `Files.createDirectories`): same rename-based atomic-write protocol,
  * same visibility semantics (POSIX rename is atomic), no subprocess, no
  * `.crc` sidecar (Spark 4's own checksum-manager layer still wraps this
  * one and keeps its integrity files — they just stop forking too).
  * Everything else (open/list/exists/delete) inherits the FileSystem
  * manager's fork-free paths.
  *
  * LOCAL ONLY by contract: the constructor refuses non-file schemes — on a
  * cluster checkpointing to HDFS/S3 the default manager is correct and
  * this conf must not be set (the replay harness scopes it to its own
  * temp-dir checkpoints and restores the previous value). */
final class LocalNioCheckpointFileManager(path: Path, hadoopConf: Configuration)
    extends FileSystemBasedCheckpointFileManager(path, hadoopConf) {

  {
    val scheme = path.toUri.getScheme
    require(scheme == null || scheme == "file",
      s"LocalNioCheckpointFileManager handles file:// checkpoints only, got $path")
  }

  private def nio(p: Path): java.nio.file.Path = Paths.get(p.toUri.getPath)

  override def createTempFile(tempPath: Path): FSDataOutputStream = {
    val p = nio(tempPath)
    val parent = p.getParent
    if (parent != null) Files.createDirectories(parent): Unit
    new FSDataOutputStream(
      new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(p.toFile), 64 * 1024), null)
  }

  override def renameTempFile(srcPath: Path, dstPath: Path,
      overwriteIfPossible: Boolean): Unit = {
    val s = nio(srcPath)
    val d = nio(dstPath)
    // same check-then-rename the parent class does; the move itself is one
    // atomic rename(2)
    if (!overwriteIfPossible && Files.exists(d))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"failed to rename $srcPath to $dstPath: destination exists")
    Files.move(s, d, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }

  override def mkdirs(p: Path): Unit = {
    Files.createDirectories(nio(p)): Unit
  }

  override def exists(p: Path): Boolean = Files.exists(nio(p))
}
