package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation — the C4/RefinedWeb front gate a crawl pipeline runs before
  * any text is even looked at: normalize each record's URL, strip tracking
  * parameters, extract the registrable domain, drop blocklisted domains,
  * and cap the per-domain document count (crawls are power-law dominated by
  * a few hosts; an uncapped corpus IS those hosts).
  *
  * Everything here is per-row codegen'd string/regex work over one scan —
  * the 100 TB shape is "free" (no shuffle until the explicitly-bounded
  * per-domain cap) — and every regex is RE2-compatible (no lookarounds, no
  * backreferences) so the DuckDB oracle runs the SAME patterns.
  *
  * Scope, documented rather than half-implemented: no userinfo
  * (`user:pass@host` hosts parse as invalid), no IPv6 literals, no
  * percent-decoding, and the registrable domain uses a compact heuristic
  * (exactly the common `co.uk`-style second-level suffixes) instead of the
  * full Public Suffix List — the PSL is a data file, not an algorithm, and
  * swapping it in changes only [[regDomain]].
  *
  * Reference analog: the reference has no crawl-curation surface at all
  * (`src/engine/` is event-store query machinery); this is part of the
  * training-data layer this library adds on top.
  */
object UrlCuration {

  /** Query parameters that carry tracking state, not content identity. */
  private val TrackingParams = "(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)"

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Registrable domain from a lowercased host: IPs and one/two-label
    * hosts pass through whole; `<x>.co.uk`-style two-level public suffixes
    * keep three labels; everything else keeps the last two. */
  private def regDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val isIp = host.rlike("^[0-9]+(\\.[0-9]+){3}$")
    val twoLevel = element_at(labels, -2).isin("co", "com", "org", "net", "ac", "gov", "edu") &&
      length(element_at(labels, -1)) === 2 && n >= 3
    when(isIp || n <= 2, host)
      .when(twoLevel, concat_ws(".", slice(labels, -3, 3)))
      .otherwise(concat_ws(".", slice(labels, -2, 2)))
  }

  /** Parse + normalize one URL column. Output, one row per input row
    * (total — malformed URLs keep their row with `valid = false` and NULL
    * parts, so curation decisions stay auditable):
    *
    * {{{ id | valid | scheme | host | port | reg_domain | path | query_clean | clean_url }}}
    *
    *  - scheme and host lowercase; the fragment is dropped;
    *  - `port` is NULL when absent OR when it is the scheme default
    *    (http:80 / https:443) — default ports do not survive into
    *    `clean_url` (the classic dedup-relevant normalization);
    *  - `path` defaults to `/`;
    *  - `query_clean` drops [[TrackingParams]] parameters and empty
    *    fragments of `&&` runs, preserving the remaining order (C4 does
    *    not sort parameters; neither do we) — as regexp_replace chains,
    *    not a higher-order `filter` (HOFs have no doGenCode and would
    *    knock the whole projection out of whole-stage codegen);
    *  - `clean_url` reassembles the normalized parts.
    *
    * 100 TB shape: one projection, zero shuffles, whole-stage codegen. */
  def parseUrls(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val noFrag = regexp_replace(col(urlCol), "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val hostport = regexp_extract(noFrag, SchemeRe + "([^/?#]+)", 2)
    val host = lower(regexp_replace(hostport, ":[0-9]+$", ""))
    val portS = regexp_extract(hostport, ":([0-9]+)$", 1)
    val rawPort = when(portS === "", lit(null).cast("long")).otherwise(portS.cast("long"))
    val port = when(scheme === "http" && rawPort === 80L, lit(null).cast("long"))
      .when(scheme === "https" && rawPort === 443L, lit(null).cast("long"))
      .otherwise(rawPort)
    val rawPath = regexp_extract(noFrag, SchemeRe + "[^/?#]+(/[^?#]*)", 2)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val rawQ = regexp_extract(noFrag, "\\?(.*)$", 1)
    // drop tracking params (consuming one adjacent '&'), then collapse the
    // '&&' runs that empty parameters leave, then trim edge '&'s — the
    // same result as split/filter/join, in codegen'd regex replaces
    val qStripped = regexp_replace(rawQ, "(^|&)" + TrackingParams + "=[^&]*", "")
    val qClean = regexp_replace(regexp_replace(qStripped, "&{2,}", "&"), "^&+|&+$", "")
    // a valid authority has a scheme and a host with no userinfo marker
    val valid = scheme =!= "" && host =!= "" && !host.contains("@")
    val portPart = when(port.isNull, lit("")).otherwise(concat(lit(":"), port.cast("string")))
    val qPart = when(qClean === "", lit("")).otherwise(concat(lit("?"), qClean))
    def v(c: Column): Column = when(valid, c)
    df.select(col(idCol).as("id"), valid.as("valid"),
      v(scheme).as("scheme"), v(host).as("host"), when(valid, port).as("port"),
      v(regDomain(host)).as("reg_domain"), v(path).as("path"),
      v(qClean).as("query_clean"),
      v(concat(scheme, lit("://"), host, portPart, path, qPart)).as("clean_url"))
  }

  /** Per-registrable-domain corpus profile over a [[parseUrls]] frame:
    *
    * {{{ reg_domain | n_docs | share_ppm }}}
    *
    * `share_ppm` = floor(1e6 · n_docs / total valid docs). The global
    * total is a window over the domain-cardinality aggregate rows — never
    * a driver collect. Invalid rows are excluded (they have no domain). */
  def domainStats(parsed: DataFrame): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    parsed.filter(col("valid"))
      .groupBy("reg_domain").agg(count(lit(1)).as("n_docs"))
      .withColumn("share_ppm",
        floor(col("n_docs") * lit(1000000.0) / sum(col("n_docs")).over(all)).cast("long"))
  }

  /** The composed URL gate: parse → drop invalid → drop blocklisted
    * registrable domains → cap each surviving domain at `perDomainCap`
    * documents (deterministic salted-hash admission — the
    * [[DataMix.samplePerGroup]] bounded two-phase aggregate, never a
    * per-domain window). Output, one row per KEPT document:
    *
    * {{{ id | reg_domain | clean_url | rk }}}
    *
    * with `rk` the document's 0-based admission rank within its domain.
    *
    * 100 TB shape: the blocklist (thousands of rows) broadcasts into an
    * anti-join; the cap is the bounded TopKByDot aggregate (domains × cap
    * rows out); the winner set joins back keyed by id — both sides hash on
    * the id, AQE sizes the exchange. */
  def curate(df: DataFrame, idCol: String, urlCol: String,
      blockedDomains: DataFrame, perDomainCap: Int,
      salt: String = "url"): DataFrame = {
    require(perDomainCap > 0, s"perDomainCap must be > 0, got $perDomainCap")
    val blocked = blockedDomains.select(
      lower(col(blockedDomains.columns.head)).as("reg_domain"))
    val parsed = parseUrls(df, idCol, urlCol)
      .filter(col("valid"))
      .join(broadcast(blocked), Seq("reg_domain"), "left_anti")
    val kept = DataMix.samplePerGroup(
      parsed.select(col("reg_domain"), col("id")), "reg_domain", "id",
      perDomainCap, salt)
    parsed.select(col("id"), col("reg_domain"), col("clean_url"))
      .join(kept.select(col("id"), col("rk")), Seq("id"))
      .select(col("id"), col("reg_domain"), col("clean_url"), col("rk"))
  }
}
