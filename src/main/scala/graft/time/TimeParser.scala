package graft.time

import java.time.{Instant, LocalDate, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.util.Try

/** Normalizes time inputs to epoch seconds (UTC), matching the reference's
  * `TimeParser` (sneldb `src/shared/time.rs:13-101`):
  *
  *  - RFC3339/ISO-8601 strings (with offset) → UTC epoch seconds (fraction truncated)
  *  - `YYYY-MM-DD` → midnight UTC
  *  - integers: unit inferred from digit count —
  *    ≤11 digits seconds, 12-14 ms, 15-16 µs, 17-19 ns
  *  - floats: treated as seconds, floored
  */
object TimeParser {

  /** Parse a time literal (string form) to epoch seconds; None if unparseable. */
  def parseToEpochSeconds(input: String): Option[Long] = {
    val s = input.trim
    parseIso(s)
      .orElse(parseDateOnly(s))
      .orElse(Try(BigInt(s)).toOption.flatMap(normalizeIntegerEpoch))
      // non-finite doubles are NOT times: floor(NaN).toLong = 0 and
      // floor(Inf).toLong = Long.MaxValue silently minted garbage epochs,
      // and swallowed "NaN" before the compare ladder's f64 rung could
      // apply NaN-equals-everything (r16 finding, via ADVICE r15's eqLike)
      .orElse(Try(s.toDouble).toOption.filter(d => !d.isNaN && !d.isInfinity)
        .map(d => math.floor(d).toLong))
  }

  private val isoNoOffset = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  private def parseIso(s: String): Option[Long] =
    Try(OffsetDateTime.parse(s).toInstant.getEpochSecond).toOption
      .orElse( // "2024-01-01T10:00:00" without offset → assume UTC (reference rejects these,
               // but scenario corpus always carries offsets; accept for robustness)
        Try(java.time.LocalDateTime.parse(s, isoNoOffset).toInstant(ZoneOffset.UTC).getEpochSecond).toOption)
      .orElse(Try(Instant.parse(s).getEpochSecond).toOption)

  private def parseDateOnly(s: String): Option[Long] =
    Try(LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC).toInstant.getEpochSecond).toOption

  /** Digit-count heuristic — reference `normalize_integer_epoch` (`time.rs:83-101`). */
  def normalizeIntegerEpoch(n: BigInt): Option[Long] = {
    val digits = n.abs.toString.length
    val secs: BigInt =
      if (digits <= 11) n
      else if (digits <= 14) n / 1000
      else if (digits <= 16) n / 1000000
      else if (digits <= 19) n / 1000000000L
      else return None
    if (secs.isValidLong) Some(secs.toLong) else None
  }
}
