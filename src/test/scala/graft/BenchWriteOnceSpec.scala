package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Recorded bench tables are append-only history: [[Bench.writeOnce]] must
  * never truncate an existing artifact (VERDICT r15 #5 — an outside
  * harness clobbered a committed full table; CREATE_NEW semantics make
  * Bench itself provably non-clobbering, and round_close.sh verifies no
  * tracked artifact is modified). */
class BenchWriteOnceSpec extends AnyFunSuite {

  test("writeOnce never truncates; collisions land in fresh -N files") {
    val dir = Files.createTempDirectory("graft_bench_once_")
    val base = dir.resolve("BENCH_FULL_123").toString
    val p1 = Bench.writeOnce(base, """{"run":1}""")
    assert(p1 == s"$base.json")
    val p2 = Bench.writeOnce(base, """{"run":2}""")
    val p3 = Bench.writeOnce(base, """{"run":3}""")
    assert(p2 == s"$base-1.json" && p3 == s"$base-2.json",
      s"collisions must suffix, got $p2 / $p3")
    assert(new String(Files.readAllBytes(Paths.get(p1)), "UTF-8").trim == """{"run":1}""",
      "the first artifact must be byte-identical after later runs")
    assert(new String(Files.readAllBytes(Paths.get(p2)), "UTF-8").trim == """{"run":2}""")
  }

  test("atomicReplace through a symlink replaces the LINK, never its target") {
    // the r15 clobber's actual mechanism (diagnosed r16): the round
    // harness re-points BENCH_FULL_LATEST.json as a symlink to a stamped
    // recorded artifact; an in-place open would write THROUGH it
    val dir = Files.createTempDirectory("graft_bench_link_")
    val target = dir.resolve("BENCH_FULL_999.json")
    Files.write(target, "{\"recorded\":true}\n".getBytes("UTF-8"))
    val latest = dir.resolve("BENCH_FULL_LATEST.json")
    Files.createSymbolicLink(latest, target.getFileName)
    assert(Bench.atomicReplace(latest.toString, "{\"fresh\":true}"))
    assert(new String(Files.readAllBytes(target), "UTF-8").trim == "{\"recorded\":true}",
      "the stamped artifact must be byte-identical after the LATEST update")
    assert(!Files.isSymbolicLink(latest) &&
      new String(Files.readAllBytes(latest), "UTF-8").trim == "{\"fresh\":true}",
      "LATEST must become a regular file holding the new line")
  }

  test("ioProbe measures a positive fsync latency and leaves no files behind") {
    // the r19 IO-axis instrument: fixed work (32 create+fsync+rename files)
    // returning the MEDIAN per-file latency in ms. The value is host-state
    // dependent (0.4-17 ms measured), so assert structure, not magnitude:
    // positive, finite, and the probe's temp dir fully removed.
    val tmpRoot = Paths.get(System.getProperty("java.io.tmpdir"))
    def probeDirs() = {
      val s = Files.list(tmpRoot)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("graft_io_probe_")).toSet
      finally s.close()
    }
    val before = probeDirs()
    val ms = Bench.ioProbe()
    assert(ms > 0.0 && ms.isFinite, s"median latency must be positive, got $ms")
    assert(probeDirs() == before, "probe must remove its temp dir and files")
  }

  test("atomicReplace's TMP write never follows a planted symlink either") {
    // ADVICE r16: the tmp name is predictable (<path>.tmp), so the same
    // adversary can plant THAT as a symlink to a recorded artifact — a
    // default-options Files.write would clobber through it before the move
    val dir = Files.createTempDirectory("graft_bench_tmplink_")
    val target = dir.resolve("BENCH_FULL_888.json")
    Files.write(target, "{\"recorded\":true}\n".getBytes("UTF-8"))
    val latest = dir.resolve("BENCH_FULL_LATEST.json")
    Files.createSymbolicLink(
      Paths.get(latest.toString + ".tmp"), target.getFileName)
    assert(Bench.atomicReplace(latest.toString, "{\"fresh\":true}"))
    assert(new String(Files.readAllBytes(target), "UTF-8").trim == "{\"recorded\":true}",
      "the stamped artifact must survive a planted tmp symlink")
    assert(new String(Files.readAllBytes(latest), "UTF-8").trim == "{\"fresh\":true}")
    assert(!Files.exists(Paths.get(latest.toString + ".tmp")),
      "the tmp must not remain after a successful replace")
  }
}
