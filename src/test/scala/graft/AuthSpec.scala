package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.auth.{AuthManager, Role}
import graft.store.{EventStore, ExecResult, SecureEventStore}

class AuthSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def signed(key: String)(cmd: String): String =
    s"$cmd user_id=IGNORED signature=IGNORED" // placeholder, see sign()

  private def sign(user: String, key: String, cmd: String): String =
    s"$cmd user_id=$user signature=${AuthManager.hmacHex(key, cmd)}"

  private def setup(): SecureEventStore = {
    val dir = Files.createTempDirectory("graft_auth_").toString
    val s = new SecureEventStore(new EventStore(spark, dir), new AuthManager(dir))
    assert(s.bootstrapAdmin("admin", "admin-key").isRight)
    s
  }

  private def ok(r: ExecResult): String = r match {
    case ExecResult.Ok(m) => m
    case other            => fail(s"expected Ok, got $other")
  }
  private def err(r: ExecResult): String = r match {
    case ExecResult.Error(e) => e
    case other               => fail(s"expected Error, got $other")
  }

  test("signed admin flow: create user, grant, query within grants") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE orders FIELDS { amount: "int" }"""))
    ok(admin("""CREATE USER reader WITH KEY "read-key""""))
    ok(admin("GRANT READ ON orders TO reader"))
    ok(admin("""STORE orders FOR c1 PAYLOAD {"amount": 5}"""))

    def reader(c: String) = s.execute(sign("reader", "read-key", c))
    s.execute(sign("reader", "read-key", "QUERY orders")) match {
      case ExecResult.Frame(df) => assert(df.count() == 1)
      case other                => fail(other.toString)
    }
    // no write grant → STORE denied
    assert(err(reader("""STORE orders FOR c2 PAYLOAD {"amount": 1}""")).contains("permission denied"))
    // no grant on other type → read denied
    ok(admin("""DEFINE secret FIELDS { x: "int" }"""))
    assert(err(reader("QUERY secret")).contains("permission denied"))
  }

  test("roles: editor reads and writes; write-only cannot read") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE t FIELDS { v: "int" }"""))
    ok(admin("""CREATE USER ed WITH KEY "ek" WITH ROLES [editor]"""))
    ok(admin("""CREATE USER wo WITH KEY "wk" WITH ROLES [write-only]"""))
    ok(s.execute(sign("ed", "ek", """STORE t FOR c PAYLOAD {"v": 1}""")))
    ok(s.execute(sign("wo", "wk", """STORE t FOR c PAYLOAD {"v": 2}""")))
    assert(err(s.execute(sign("wo", "wk", "QUERY t"))).contains("permission denied"))
    s.execute(sign("ed", "ek", "QUERY t")) match {
      case ExecResult.Frame(df) => assert(df.count() == 2)
      case other                => fail(other.toString)
    }
  }

  test("grant edges: undefined event type, invalid permission, unknown user, merge, lenient revoke") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE orders FIELDS { amount: "int" }"""))
    ok(admin("""CREATE USER mu WITH KEY "mk""""))
    // reference scenario: granting on an undefined event type is an error
    assert(err(admin("GRANT READ ON nonexistent_event TO mu")).contains("no schema defined"))
    assert(err(admin("GRANT EXECUTE ON orders TO mu")).contains("unknown permission"))
    assert(err(admin("GRANT READ ON orders TO ghost")).contains("unknown user"))
    // grants merge across statements; SHOW PERMISSIONS FOR form accepted
    ok(admin("GRANT READ ON orders TO mu"))
    ok(admin("GRANT WRITE ON orders TO mu"))
    val perms = ok(admin("SHOW PERMISSIONS FOR mu"))
    assert(perms.contains("reads=orders") && perms.contains("writes=orders"))
    // revoking a permission the user doesn't hold is a no-op, not an error
    ok(admin("REVOKE WRITE ON orders FROM mu"))
    ok(admin("REVOKE WRITE ON orders FROM mu"))
  }

  test("revoke key: old signature dies, permissions survive, recreate fails") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE t FIELDS { v: "int" }"""))
    ok(admin("""CREATE USER rk WITH KEY "old-key""""))
    ok(admin("GRANT READ ON t TO rk"))
    val msg = ok(admin("REVOKE KEY rk"))
    val newKey = msg.split(":").last.trim
    assert(err(s.execute(sign("rk", "old-key", "QUERY t"))).contains("invalid signature"))
    // new key works and the read grant survived the rotation
    s.execute(sign("rk", newKey, "QUERY t")) match {
      case ExecResult.Frame(df) => assert(df.count() == 0)
      case other                => fail(other.toString)
    }
    assert(err(admin("""CREATE USER rk WITH KEY "x"""")).contains("already exists"))
  }

  test("bad signature, lockout after repeated failures, unknown user") {
    val dir = Files.createTempDirectory("graft_auth_").toString
    val auth = new AuthManager(dir, maxFailures = 3)
    val s = new SecureEventStore(new EventStore(spark, dir), auth)
    s.bootstrapAdmin("admin", "k")
    assert(err(s.execute("PING user_id=admin signature=deadbeef")).contains("invalid signature"))
    assert(err(s.execute("PING user_id=ghost signature=x")).contains("unknown user"))
    (1 to 2).foreach(_ => s.execute("PING user_id=admin signature=bad"))
    // locked out now even with the correct signature
    assert(err(s.execute(sign("admin", "k", "PING"))).contains("locked out"))
  }

  test("admin-only user management; list and show permissions") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""CREATE USER u1 WITH KEY "k1""""))
    assert(err(s.execute(sign("u1", "k1", """CREATE USER u2 WITH KEY "k2""""))).contains("admin role required"))
    ok(admin("""DEFINE d FIELDS { x: "int" }"""))
    ok(admin("GRANT READ, WRITE ON d TO u1"))
    assert(ok(admin("SHOW PERMISSIONS u1")).contains("reads=d"))
    assert(ok(admin("LIST USERS")).contains("u1"))
    ok(admin("REVOKE WRITE ON d FROM u1"))
    assert(err(s.execute(sign("u1", "k1", """STORE d FOR c PAYLOAD {"x": 1}"""))).contains("permission denied"))
    // key rotation invalidates the old key
    ok(admin("REVOKE KEY u1"))
    assert(err(s.execute(sign("u1", "k1", "QUERY d"))).contains("invalid signature"))
  }

  test("missing credentials rejected") {
    val s = setup()
    assert(err(s.execute("PING")).contains("missing credentials"))
  }
}
