package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.auth.AuthManager

/** Data-driven replay of the reference's FULL integration scenario corpus
  * (`/root/reference/tests/integration/scenarios.json`), executed the way
  * `tests/integration/runner.rs` does:
  *
  *  - every input command runs against a fresh engine, output accumulates,
  *    matchers evaluate against the whole transcript;
  *  - `HMAC_SHA256(key, message)` placeholders are substituted
  *    (`auth_helper.rs:17-42`: message cut at the first `)`);
  *  - with auth enabled, admin-gated commands without credentials are
  *    auto-signed with the configured initial admin (`runner.rs:139-160` —
  *    we use the engine's credential-suffix form, see DIVERGENCES.md #3);
  *  - `SLEEP`/`RESTART` pseudo-commands advance the injected clock /
  *    reload the engine from disk; `{TOKEN:user}` substitution and token
  *    capture live in [[Proto]];
  *  - config mapping: `auth.bypass_auth` → bypass mode,
  *    `auth.initial_admin_*` → bootstrap admin, `wal.enabled` → WAL,
  *    `engine.fill_factor` → memtable flush threshold. `shard_count` and
  *    WAL buffering knobs have no analog (partitioning is Spark's).
  *
  * Scenarios our engine intentionally diverges on are skipped with the
  * reason inline — each is also recorded in docs/DIVERGENCES.md.
  */
class ScenarioCorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val corpusPath = "/root/reference/tests/integration/scenarios.json"

  /** name → reason. Divergences documented in docs/DIVERGENCES.md. */
  private val skip: Map[String, String] = Map(
    "wal_fsync_every_n_without_flush_each_write" ->
      ("asserts buffered-WAL data LOSS on restart; our WAL fsyncs every " +
        "append so the event survives — strictly more durable; the loss " +
        "path is covered wal-disabled in CoreScenariosSpec"))

  /** Order-insensitive re-expression of matchers that pin the reference's
    * HashMap column ITERATION ORDER (row endings like `,1]` mean "the row
    * whose `id` cell is 1"; our rows carry identical values in
    * schema-declaration order, so the literal substring never matches).
    * Each entry replaces the corpus matcher with the same semantic
    * assertion on named CELLS: (mustExist, column → cell text). A row
    * matches a rule when every listed cell equals the expected text; the
    * rule passes when such a row exists (or, for mustExist=false, none
    * does). See DIVERGENCES.md #7.
    */
  private val cellRules: Map[String, Seq[(Boolean, Map[String, String])]] = {
    val id2not1 = Seq(true -> Map("id" -> "2"), false -> Map("id" -> "1"))
    val bothIds = Seq(true -> Map("id" -> "1"), true -> Map("id" -> "2"))
    Map(
      "simple_query_status_confirmed" ->
        Seq(true -> Map("status" -> "confirmed", "order_id" -> "1")),
      "since_using_created_at_equal_boundary_included" -> id2not1,
      "since_using_created_at_ns_input_excludes_first" -> id2not1,
      "since_using_created_at_minus_offset_boundary"   -> id2not1,
      "since_using_created_at_with_offset"             -> id2not1,
      "since_using_date_field"                         -> id2not1,
      "since_using_optional_datetime_skips_nulls"      -> id2not1,
      "since_using_created_at_iso8601_selection"       -> id2not1,
      "since_using_created_at_ms_input"                -> bothIds,
      "store_created_at_ms_number_normalized"          -> bothIds,
      "since_unparsable_ignored_includes_all"          -> bothIds,
      "since_using_created_at_numeric_units_selection" -> bothIds,
      "since_using_created_at_us_input_inclusive" ->
        Seq(true -> Map("id" -> "1"), false -> Map("id" -> "2")))
  }

  private case class Matcher(kind: String, values: Seq[String])
  private case class Config(bypassAuth: Boolean, adminUser: Option[String],
      adminKey: String, walEnabled: Boolean, flushThreshold: Int)
  private case class Scenario(name: String, commands: Seq[String],
      matchers: Seq[Matcher], config: Config)

  private def loadCorpus(): Seq[Scenario] = {
    val root = graft.store.EventStore.readTree(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(corpusPath)), "UTF-8"))
    root.elements().asScala.map { s =>
      val name = s.get("name").asText()
      val commands = s.get("input_commands").elements().asScala.map(_.asText()).toSeq
      val ms = (Option(s.get("matchers")).map(_.elements().asScala.toSeq).getOrElse(Nil) ++
        Option(s.get("matcher")).toSeq).map { m =>
        val v = m.get("value")
        val values = if (v.isArray) v.elements().asScala.map(_.asText()).toSeq else Seq(v.asText())
        Matcher(m.get("kind").asText(), values)
      }
      val cfg = Option(s.get("config"))
      val auth = cfg.flatMap(c => Option(c.get("auth")))
      val config = Config(
        bypassAuth = auth.flatMap(a => Option(a.get("bypass_auth"))).forall(_.asBoolean(true)),
        adminUser = auth.flatMap(a => Option(a.get("initial_admin_user"))).map(_.asText()),
        adminKey = auth.flatMap(a => Option(a.get("initial_admin_key"))).map(_.asText())
          .getOrElse("admin-key-123"),
        walEnabled = cfg.flatMap(c => Option(c.get("wal")))
          .flatMap(w => Option(w.get("enabled"))).forall(_.asBoolean(true)),
        flushThreshold = cfg.flatMap(c => Option(c.get("engine")))
          .flatMap(e => Option(e.get("fill_factor"))).map(_.asInt()).getOrElse(32768))
      Scenario(name, commands, ms, config)
    }.toSeq
  }

  /** `HMAC_SHA256(key, message)` → hex signature; message cut at the FIRST
    * `)` like the reference helper (`auth_helper.rs:22-40`). */
  private def substituteHmac(cmd: String): String = {
    var result = cmd
    var start = result.indexOf("HMAC_SHA256(")
    while (start >= 0) {
      val end = result.indexOf(')', start)
      if (end < 0) return result
      val inner = result.substring(start + 12, end)
      val comma = inner.indexOf(',')
      if (comma < 0) return result
      val key = inner.substring(0, comma).trim.stripPrefix("\"").stripSuffix("\"").trim
      val message = inner.substring(comma + 1).trim
      result = result.substring(0, start) + AuthManager.hmacHex(key, message) +
        result.substring(end + 1)
      start = result.indexOf("HMAC_SHA256(")
    }
    result
  }

  private val adminGated = Seq("CREATE USER", "GRANT", "REVOKE", "SHOW PERMISSIONS",
    "DEFINE", "LIST USERS")

  private def run(s: Scenario): Unit = {
    val c = s.config
    val p = new Proto(spark, authEnabled = !c.bypassAuth, walEnabled = c.walEnabled,
      flushThreshold = c.flushThreshold, adminUser = c.adminUser, adminKey = c.adminKey)
    s.commands.foreach { cmd =>
      val t = cmd.trim
      if (t.toUpperCase.startsWith("SLEEP ")) p.sleep(t.split("\\s+")(1).toLong)
      else if (t.equalsIgnoreCase("RESTART")) p.restart()
      else {
        var processed = substituteHmac(cmd)
        // runner.rs:139-160 — sign admin-gated bare commands as the admin
        val hasAuth = processed.contains("user_id=") || processed.contains("signature=")
        if (!c.bypassAuth && c.adminUser.isDefined && !hasAuth &&
            adminGated.exists(processed.trim.startsWith))
          processed = s"$processed user_id=${c.adminUser.get} " +
            s"signature=${AuthManager.hmacHex(c.adminKey, processed.trim)}"
        p.send(processed)
      }
    }
    val out = p.output
    cellRules.get(s.name) match {
      case Some(rules) =>
        val rows = outputRows(out)
        rules.foreach { case (mustExist, cells) =>
          val hit = rows.exists(r => cells.forall { case (c, v) => r.get(c).contains(v) })
          assert(hit == mustExist,
            s"expected a row with cells $cells to ${if (mustExist) "exist" else "be absent"}" +
              s"\n--- rows ---\n${rows.mkString("\n")}\n--- output ---\n$out")
        }
        // the cell rules replace ONLY the order-pinning matcher values (row
        // fragments like `,1]` that encode HashMap column iteration order);
        // every other original assertion still runs against the transcript
        checkMatchers(s.matchers.flatMap(m =>
          m.copy(values = m.values.filterNot(pinsRowOrder)) match {
            case f if f.values.isEmpty => None
            case f                     => Some(f)
          }), out)
      case None => checkMatchers(s.matchers, out)
    }
  }

  /** A matcher value "pins row order" when it is a fragment of a serialized
    * row ARRAY (ends inside/at a `]` row terminator, e.g. `,1]` or
    * `"confirmed",1]`) — such values assert the reference's Rust-HashMap
    * column iteration order, which is not reproducible (DIVERGENCES.md #7).
    */
  private def pinsRowOrder(v: String): Boolean = v.endsWith("]")

  private def checkMatchers(ms: Seq[Matcher], out: String): Unit = ms.foreach { m =>
    m.kind match {
      case "include" | "include_all" => m.values.foreach(v =>
        assert(out.contains(v), s"expected output to include <$v>\n--- output ---\n$out"))
      case "include_none" => m.values.foreach(v =>
        assert(!out.contains(v), s"expected output to NOT include <$v>\n--- output ---\n$out"))
      case "regex" => m.values.foreach(v =>
        assert(v.r.findFirstIn(out).isDefined, s"expected output to match /$v/\n--- output ---\n$out"))
      case other => fail(s"unknown matcher kind: $other")
    }
  }

  /** Every schema/batch frame in `out`, flattened to rows of
    * (column → cell text). Cell text is the JSON node's `asText` — numbers
    * render without quotes, matching the expected texts in [[cellRules]].
    */
  private def outputRows(out: String): Seq[Map[String, String]] = {
    var cols: Seq[String] = Nil
    val rows = Seq.newBuilder[Map[String, String]]
    out.linesIterator.map(_.trim).filter(_.startsWith("{")).foreach { line =>
      val n = try graft.store.EventStore.readTree(line) catch { case _: Exception => null }
      if (n != null) Option(n.get("type")).map(_.asText()) match {
        case Some("schema") =>
          cols = n.get("columns").elements().asScala.map(_.asText()).toSeq
        case Some("batch") =>
          n.get("rows").elements().asScala.foreach { r =>
            rows += cols.zip(r.elements().asScala.map(_.asText()).toSeq).toMap
          }
        case _ => ()
      }
    }
    rows.result()
  }

  private val corpus =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(corpusPath))) loadCorpus() else Nil

  corpus.foreach { s =>
    skip.get(s.name) match {
      case Some(reason) => ignore(s"scenario ${s.name} [skipped: $reason]") {}
      case None         => test(s"scenario ${s.name}") { run(s) }
    }
  }
}
