package graft

import java.nio.file.{Files, Paths}
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
}
