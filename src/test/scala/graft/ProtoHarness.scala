package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.auth.AuthManager
import graft.store.{EventStore, Responses, SecureEventStore}

/** Minimal analog of the reference's integration-scenario runner
  * (`tests/integration/runner.rs`): executes commands against a
  * [[SecureEventStore]], accumulates the rendered line-protocol output,
  * substitutes `{TOKEN:user}` placeholders, captures session tokens from
  * `AUTH` responses, and supports RESTART (new engine instance over the
  * same root — WAL/catalog recovery path). */
final class Proto(spark: SparkSession, authEnabled: Boolean, walEnabled: Boolean = true,
    flushThreshold: Int = 32768, adminUser: Option[String] = Some("admin"),
    adminKey: String = "admin-key-123") {
  val dir: String = Files.createTempDirectory("graft_proto_").toString
  // realistic epoch base: scenario matchers include_none small integers
  // (order ids, amounts) that must not collide with rendered store-times
  private var clockT = 1750000000L
  private val clock: () => Long = () => { clockT += 1; clockT }

  private def mkSecure(): SecureEventStore = new SecureEventStore(
    new EventStore(spark, dir, flushThreshold = flushThreshold, clock = clock,
      walEnabled = walEnabled),
    new AuthManager(dir), bypassAuth = !authEnabled)

  var secure: SecureEventStore = mkSecure()
  if (authEnabled) adminUser.foreach(u => secure.bootstrapAdmin(u, adminKey))
  def store: EventStore = secure.store

  private val sb = new StringBuilder
  private val tokens = mutable.Map.empty[String, String]

  /** Drop the in-memory engine and reload from disk (scenario RESTART). */
  def restart(): Unit = { secure = mkSecure() }

  /** Scenario SLEEP pseudo-command: advance the injected clock (≥1 s so
    * ordering by store-time is observable, like the reference's real sleep). */
  def sleep(ms: Long): Unit = { clockT += math.max(1L, ms / 1000L) }

  def send(cmd: String): String = {
    val withTok = """\{TOKEN:(\w+)\}""".r
      .replaceAllIn(cmd, m => tokens.getOrElse(m.group(1), "missing_token"))
    val r = Responses.render(secure.execute(withTok))
    val tokIdx = r.indexOf("OK TOKEN ")
    if (tokIdx >= 0) {
      val user = withTok.trim.substring(5).split(":")(0)
      tokens(user) = r.substring(tokIdx + 9).linesIterator.next().trim
    }
    sb.append(r); r
  }
  def as(user: String, key: String)(cmd: String): String =
    send(s"$cmd user_id=$user signature=${AuthManager.hmacHex(key, cmd)}")
  def admin(cmd: String): String = as("admin", "admin-key-123")(cmd)
  def authCmd(user: String, key: String): String =
    send(s"AUTH $user:${AuthManager.hmacHex(key, user)}")
  def output: String = sb.toString
}

object Proto {
  def assertIncludes(out: String, frags: String*): Unit =
    frags.foreach(f => assert(out.contains(f), s"output missing <$f>:\n$out"))
  def assertExcludes(out: String, frags: String*): Unit =
    frags.foreach(f => assert(!out.contains(f), s"output must not contain <$f>:\n$out"))
}
