package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.time.TimeParser

/** Property test of [[TimeParser]] against a direct model of the
  * reference's `shared/time.rs`:
  *  - integer unit inference by digit count (≤11 s, 12-14 ms, 15-16 µs,
  *    17-19 ns, >19 rejected), division truncating toward zero for
  *    negatives exactly like Rust's `/`;
  *  - RFC3339 strings with arbitrary offsets normalize to UTC epoch
  *    seconds with the fraction truncated;
  *  - `YYYY-MM-DD` is midnight UTC.
  */
class TimeParserPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("integer unit inference matches the reference rule across magnitudes") {
    def model(n: BigInt): Option[Long] = {
      val digits = n.abs.toString.length
      val secs: BigInt =
        if (digits <= 11) n
        else if (digits <= 14) n / 1000
        else if (digits <= 16) n / 1000000
        else if (digits <= 19) n / 1000000000L
        else return None
      if (secs.isValidLong) Some(secs.toLong) else None
    }
    // magnitudes straddling every digit-count boundary, both signs
    val boundaries = Seq(0, 1, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20)
      .flatMap { d =>
        val lo = if (d == 0) BigInt(0) else BigInt(10).pow(d - 1)
        val hi = BigInt(10).pow(d) - 1
        Seq(lo, hi, lo + 1, hi - 1).filter(_ >= 0)
      }
    val gens = Gen.oneOf(
      Gen.oneOf(boundaries),
      Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2).map(BigInt(_)))
    val cases = (1 to 500).map(i => sample(gens, i.toLong)) ++
      boundaries ++ boundaries.map(-_)
    cases.foreach { n =>
      assert(TimeParser.normalizeIntegerEpoch(n) == model(n), s"n=$n")
      // and through the string path (BigInt text round-trip)
      assert(TimeParser.parseToEpochSeconds(n.toString) == model(n)
        // the string path's float fallback floors 20+-digit numbers the
        // integer path rejects — only reachable via strings; exclude
        || n.abs.toString.length > 19, s"str n=$n")
    }
  }

  test("RFC3339 offsets normalize to UTC; fractions truncate; date-only is midnight") {
    val epochGen = Gen.chooseNum(0L, 4102444800L) // 1970..2100
    val offsets = Seq("Z", "+00:00", "+05:30", "-08:00", "+14:00", "-12:00")
    (1 to 200).foreach { i =>
      val epoch = sample(epochGen, 5000L + i)
      val offTxt = offsets(i % offsets.length)
      val off = java.time.ZoneOffset.of(offTxt)
      val txt = java.time.OffsetDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(epoch), off)
        .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
      assert(TimeParser.parseToEpochSeconds(txt).contains(epoch),
        s"epoch=$epoch offset=$offTxt txt=$txt")
      // fractional seconds truncate (reference: chrono timestamp())
      val frac = java.time.OffsetDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(epoch, 987654321L), off)
        .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
      assert(TimeParser.parseToEpochSeconds(frac).contains(epoch),
        s"frac epoch=$epoch txt=$frac")
    }
    (1 to 100).foreach { i =>
      val day = sample(Gen.chooseNum(0L, 47481L), 9000L + i) // 1970..2100 days
      val d = java.time.LocalDate.ofEpochDay(day)
      assert(TimeParser.parseToEpochSeconds(d.toString).contains(day * 86400L),
        s"date=$d")
    }
  }
}
