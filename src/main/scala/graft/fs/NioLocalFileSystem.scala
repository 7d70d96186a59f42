package graft.fs

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` FileSystem that never forks a subprocess for permissions.
  *
  * Without the libhadoop native library (the normal state of a bare Spark
  * install), `RawLocalFileSystem.setPermission` falls back to
  * `Shell.execCommand("chmod …")` — a fork+exec of the whole JVM — and it
  * is called for EVERY created file and directory (`create` applies the
  * umask-derived FsPermission; `mkOneDirWithMode` calls the same virtual
  * `setPermission`). A parquet write therefore forked once per part file,
  * once per `.crc` sidecar, and once per directory level; at gate scale
  * that is hundreds of forks per bench pass, each stalling 10 µs–100+ ms
  * depending on the JVM's RSS and host memory pressure (the measured "IO
  * weather" of the r18 watchline saga — see
  * [[graft.streaming.LocalNioCheckpointFileManager]] for the streaming
  * sibling of this fix).
  *
  * The override routes `setPermission` through
  * `Files.setPosixFilePermissions` — the same chmod(2) the shell-out
  * performed, minus the subprocess. Behavior is otherwise EXACTLY
  * LocalFileSystem's (checksums, rename, listing all inherited). The only
  * divergence: setuid/setgid/sticky bits (beyond the 9 rwx bits) are not
  * expressible through PosixFilePermission and are dropped — no Spark
  * write path requests them.
  *
  * Installed via `spark.hadoop.fs.file.impl` in the engine's own mains
  * (Bench/Verify); clusters reading HDFS/S3 are untouched (scheme-scoped),
  * and a deployment that ships libhadoop can simply not set the conf. */
final class NioLocalFileSystem
  extends LocalFileSystem(new NioRawLocalFileSystem)

final class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    Files.setPosixFilePermissions(pathToFile(p).toPath,
      NioLocalFileSystem.toPosix(permission.toShort)): Unit
  }
}

object NioLocalFileSystem {
  private val BitOrder = Array(
    PosixFilePermission.OTHERS_EXECUTE, PosixFilePermission.OTHERS_WRITE,
    PosixFilePermission.OTHERS_READ,
    PosixFilePermission.GROUP_EXECUTE, PosixFilePermission.GROUP_WRITE,
    PosixFilePermission.GROUP_READ,
    PosixFilePermission.OWNER_EXECUTE, PosixFilePermission.OWNER_WRITE,
    PosixFilePermission.OWNER_READ)

  private[graft] def toPosix(mode: Short): java.util.Set[PosixFilePermission] = {
    val s = new java.util.HashSet[PosixFilePermission]()
    var i = 0
    while (i < 9) {
      if (((mode >> i) & 1) == 1) s.add(BitOrder(i)): Unit
      i += 1
    }
    s
  }
}
