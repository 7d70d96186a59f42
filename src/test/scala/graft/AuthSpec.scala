package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.auth.{AuthManager, Perm, Role, User}
import graft.store.{EventStore, ExecResult, SecureEventStore}

class AuthSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

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
    case ExecResult.Error(e, _) => e
    case other                  => fail(s"expected Error, got $other")
  }
  private def errCode(r: ExecResult): Int = r match {
    case ExecResult.Error(_, c) => c
    case other                  => fail(s"expected Error, got $other")
  }

  test("signed admin flow: create user, grant, query within grants") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE orders FIELDS { amount: "int" }"""))
    assert(ok(admin("""CREATE USER reader WITH KEY "read-key"""")).contains("User 'reader' created"))
    ok(admin("GRANT READ ON orders TO reader"))
    ok(admin("""STORE orders FOR c1 PAYLOAD {"amount": 5}"""))

    def reader(c: String) = s.execute(sign("reader", "read-key", c))
    reader("QUERY orders") match {
      case ExecResult.Frame(df) => assert(df.count() == 1)
      case other                => fail(other.toString)
    }
    // no write grant → STORE denied with 403
    val denied = reader("""STORE orders FOR c2 PAYLOAD {"amount": 1}""")
    assert(err(denied) == "Write permission denied for event type 'orders'" && errCode(denied) == 403)
    // no grant on other type → read denied
    ok(admin("""DEFINE secret FIELDS { x: "int" }"""))
    assert(err(reader("QUERY secret")) == "Read permission denied for event type 'secret'")
  }

  test("roles: editor reads and writes; write-only cannot read; DEFINE is admin-only") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE t FIELDS { v: "int" }"""))
    ok(admin("""CREATE USER ed WITH KEY "ek" WITH ROLES [editor]"""))
    ok(admin("""CREATE USER wo WITH KEY "wk" WITH ROLES [write-only]"""))
    ok(s.execute(sign("ed", "ek", """STORE t FOR c PAYLOAD {"v": 1}""")))
    ok(s.execute(sign("wo", "wk", """STORE t FOR c PAYLOAD {"v": 2}""")))
    assert(err(s.execute(sign("wo", "wk", "QUERY t"))).contains("Read permission denied"))
    s.execute(sign("ed", "ek", "QUERY t")) match {
      case ExecResult.Frame(df) => assert(df.count() == 2)
      case other                => fail(other.toString)
    }
    // editors cannot define schemas (reference handlers/define.rs)
    assert(err(s.execute(sign("ed", "ek", """DEFINE t2 FIELDS { v: "int" }""")))
      == "Only admin users can define schemas")
  }

  test("per-type permissions OVERRIDE roles (reference PermissionCache semantics)") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE ev FIELDS { v: "int" }"""))
    ok(admin("""STORE ev FOR c PAYLOAD {"v": 42}"""))
    ok(admin("""CREATE USER ro WITH KEY "rk" WITH ROLES [read-only]"""))

    // read-only role + GRANT WRITE entry: can write AND still read (write-only
    // entry falls through to the role for READ)
    ok(admin("GRANT WRITE ON ev TO ro"))
    ok(s.execute(sign("ro", "rk", """STORE ev FOR c PAYLOAD {"v": 43}""")))
    s.execute(sign("ro", "rk", "QUERY ev")) match {
      case ExecResult.Frame(df) => assert(df.count() == 2)
      case other                => fail(other.toString)
    }

    // REVOKE both → explicit denial overrides the read-only role
    ok(admin("GRANT READ ON ev TO ro"))
    ok(admin("REVOKE READ, WRITE ON ev FROM ro"))
    assert(err(s.execute(sign("ro", "rk", "QUERY ev"))).contains("Read permission denied"))

    // editor + GRANT READ then REVOKE WRITE: write denied (entry verbatim),
    // read kept via the entry (reference permissions_override_editor_role)
    ok(admin("""CREATE USER ed2 WITH KEY "ek2" WITH ROLES [editor]"""))
    ok(admin("GRANT READ ON ev TO ed2"))
    ok(admin("REVOKE WRITE ON ev FROM ed2"))
    assert(err(s.execute(sign("ed2", "ek2", """STORE ev FOR c PAYLOAD {"v": 1}""")))
      .contains("Write permission denied"))
    s.execute(sign("ed2", "ek2", "QUERY ev")) match {
      case ExecResult.Frame(df) => assert(df.count() >= 2)
      case other                => fail(other.toString)
    }
  }

  test("grant edges: undefined event type, invalid permission, unknown user, merge, multi-type") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE orders FIELDS { amount: "int" }"""))
    ok(admin("""DEFINE products FIELDS { p: "int" }"""))
    ok(admin("""CREATE USER mu WITH KEY "mk""""))
    assert(err(admin("GRANT READ ON nonexistent_event TO mu"))
      == "No schema defined for event type 'nonexistent_event'")
    assert(err(admin("GRANT EXECUTE ON orders TO mu")).contains("Invalid permission"))
    assert(err(admin("GRANT READ ON orders TO ghost")).contains("User not found"))
    // grants merge across statements; multi-type grant
    ok(admin("GRANT READ ON orders, products TO mu"))
    ok(admin("GRANT WRITE ON orders TO mu"))
    val perms = ok(admin("SHOW PERMISSIONS FOR mu"))
    assert(perms.contains("orders: read, write") && perms.contains("products: read"))
    // revoking on an undefined event type is lenient and writes an explicit entry
    ok(admin("REVOKE WRITE ON ghost_event FROM mu"))
    assert(ok(admin("SHOW PERMISSIONS FOR mu")).contains("ghost_event: none"))
    // partial revoke leaves the rest
    ok(admin("REVOKE WRITE ON orders FROM mu"))
    val after = ok(admin("SHOW PERMISSIONS FOR mu"))
    assert(after.contains("orders: read") && !after.contains("orders: read, write"))
  }

  test("revoke key deactivates the user; permissions survive; recreate fails") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE t FIELDS { v: "int" }"""))
    ok(admin("""CREATE USER rk WITH KEY "old-key""""))
    ok(admin("GRANT READ ON t TO rk"))
    assert(ok(admin("REVOKE KEY rk")) == "Key revoked for user 'rk'")
    // old key now fails — the user is inactive, not rotated
    assert(err(s.execute(sign("rk", "old-key", "QUERY t"))) == "Authentication failed")
    assert(ok(admin("LIST USERS")).contains("rk: inactive"))
    // permissions survive deactivation
    assert(ok(admin("SHOW PERMISSIONS FOR rk")).contains("t: read"))
    assert(err(admin("""CREATE USER rk WITH KEY "x"""")) == "User already exists")
    assert(err(admin("REVOKE KEY ghost")).contains("User not found"))
  }

  test("session tokens: AUTH issues a token; TOKEN authenticates; revoke kills sessions") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE t FIELDS { v: "int" }"""))
    ok(admin("""CREATE USER tu WITH KEY "tk""""))
    ok(admin("GRANT READ, WRITE ON t TO tu"))

    val authMsg = ok(s.execute(s"AUTH tu:${AuthManager.hmacHex("tk", "tu")}"))
    assert(authMsg.startsWith("OK TOKEN "))
    val token = authMsg.stripPrefix("OK TOKEN ").trim
    assert(ok(s.execute(s"""STORE t FOR c PAYLOAD {"v": 1} TOKEN $token""")).contains("Event accepted"))
    // bad token
    assert(err(s.execute("""STORE t FOR c PAYLOAD {"v": 2} TOKEN bogus""")) == "Authentication failed")
    // bad AUTH signature
    assert(err(s.execute("AUTH tu:deadbeef")) == "Authentication failed")
    // REVOKE KEY invalidates outstanding sessions
    ok(admin("REVOKE KEY tu"))
    assert(err(s.execute(s"""STORE t FOR c PAYLOAD {"v": 3} TOKEN $token""")) == "Authentication failed")
  }

  test("bad signature, lockout after repeated failures, unknown user — all generic errors") {
    val dir = Files.createTempDirectory("graft_auth_").toString
    val auth = new AuthManager(dir, maxFailures = 3)
    val s = new SecureEventStore(new EventStore(spark, dir), auth)
    s.bootstrapAdmin("admin", "k")
    val bad = s.execute("PING user_id=admin signature=deadbeef")
    assert(err(bad) == "Authentication failed" && errCode(bad) == 401)
    // unknown user gets the same generic message (no user enumeration)
    assert(err(s.execute("PING user_id=ghost signature=x")) == "Authentication failed")
    (1 to 2).foreach(_ => s.execute("PING user_id=admin signature=bad"))
    // locked out now even with the correct signature
    assert(err(s.execute(sign("admin", "k", "PING"))) == "Rate limit exceeded")
  }

  test("admin-only user management; SHOW PERMISSIONS output shapes") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""CREATE USER u1 WITH KEY "k1""""))
    assert(err(s.execute(sign("u1", "k1", """CREATE USER u2 WITH KEY "k2"""")))
      == "Only admin users can manage users")
    assert(err(s.execute(sign("u1", "k1", "SHOW PERMISSIONS FOR u1")))
      == "Only admin users can manage permissions")
    assert(ok(admin("SHOW PERMISSIONS FOR u1")) == "User 'u1' has no permissions")
    assert(err(admin("SHOW PERMISSIONS FOR ghost")).contains("User not found"))
    ok(admin("""DEFINE d FIELDS { x: "int" }"""))
    ok(admin("GRANT READ, WRITE ON d TO u1"))
    val shown = ok(admin("SHOW PERMISSIONS FOR u1"))
    assert(shown.contains("Permissions for user 'u1':") && shown.contains("  d: read, write"))
    assert(ok(admin("LIST USERS")).contains("u1: active"))
  }

  test("bypass mode runs everything as a synthetic admin") {
    val dir = Files.createTempDirectory("graft_auth_").toString
    val s = new SecureEventStore(new EventStore(spark, dir), new AuthManager(dir), bypassAuth = true)
    assert(ok(s.execute("""DEFINE b FIELDS { v: "int" }""")).contains("Schema defined"))
    assert(ok(s.execute("""STORE b FOR c PAYLOAD {"v": 1}""")).contains("Event accepted"))
    s.execute("QUERY b") match {
      case ExecResult.Frame(df) => assert(df.count() == 1)
      case other                => fail(other.toString)
    }
  }

  test("missing credentials rejected with generic 401") {
    val s = setup()
    val r = s.execute("PING")
    assert(err(r) == "Authentication failed" && errCode(r) == 401)
  }

  test("signed command whose payload contains ' TOKEN ' routes to signature auth") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE note FIELDS { txt: "string" }"""))
    // the payload text embeds " TOKEN " — must NOT be misrouted to token auth
    val r = admin("""STORE note FOR c1 PAYLOAD {"txt": "my TOKEN is secret"}""")
    assert(ok(r).contains("Event accepted"))
    admin("QUERY note") match {
      case ExecResult.Frame(df) =>
        assert(df.collect().head.getAs[String]("txt") == "my TOKEN is secret")
      case other => fail(other.toString)
    }
    // a trailing 32-hex garbage token on an UNSIGNED command is token auth → 401
    val bogus = "QUERY note TOKEN " + "ab" * 16
    assert(errCode(s.execute(bogus)) == 401)
  }

  test("session-token auth still works and survives embedded TOKEN text") {
    val s = setup()
    val tok = ok(s.execute(s"AUTH admin:${AuthManager.hmacHex("admin-key", "admin")}"))
      .stripPrefix("OK TOKEN ").trim
    assert(tok.matches("[0-9a-f]{32}"))
    ok(s.execute(s"""DEFINE note FIELDS { txt: "string" }  TOKEN $tok"""))
    ok(s.execute(s"""STORE note FOR c1 PAYLOAD {"txt": "x TOKEN y"} TOKEN $tok"""))
    s.execute(s"QUERY note TOKEN $tok") match {
      case ExecResult.Frame(df) => assert(df.count() == 1)
      case other                => fail(other.toString)
    }
  }

  test("bypass mode strips both credential and token suffixes before parsing") {
    val dir = Files.createTempDirectory("graft_auth_").toString
    val s = new SecureEventStore(new EventStore(spark, dir), new AuthManager(dir), bypassAuth = true)
    ok(s.execute("""DEFINE b FIELDS { v: "int" }"""))
    val tok = "cd" * 16
    assert(ok(s.execute(s"""STORE b FOR c PAYLOAD {"v": 1} TOKEN $tok""")).contains("Event accepted"))
    assert(ok(s.execute("""STORE b FOR c PAYLOAD {"v": 2} user_id=x signature=y""")).contains("Event accepted"))
    s.execute("QUERY b") match {
      case ExecResult.Frame(df) => assert(df.count() == 2)
      case other                => fail(other.toString)
    }
  }

  test("SHOW of a materialization with corrupt meta errors instead of throwing") {
    val s = setup()
    def admin(c: String) = s.execute(sign("admin", "admin-key", c))
    ok(admin("""DEFINE mm FIELDS { v: "int" }"""))
    ok(admin("""STORE mm FOR c PAYLOAD {"v": 1}"""))
    ok(admin("FLUSH"))
    ok(admin("REMEMBER QUERY mm AS keepme"))
    // corrupt the stored query text
    val meta = java.nio.file.Paths.get(s.store.root, "_materializations", "keepme", "meta.json")
    Files.write(meta, """{"query": "QUERY ((", "hwm_id": 0}""".getBytes("UTF-8"))
    val r = admin("SHOW keepme")
    assert(err(r).contains("corrupt"))
  }

  test("User.canRead/canWrite unit semantics match the reference PermissionCache") {
    val ro = User("u", "k", Set(Role.ReadOnly))
    assert(ro.canRead("a") && !ro.canWrite("a"))
    // write-only entry on read-only role: write yes, read falls through to role
    val roW = ro.copy(permissions = Map("a" -> Perm(false, true)))
    assert(roW.canRead("a") && roW.canWrite("a"))
    // explicit denial overrides role
    val roD = ro.copy(permissions = Map("a" -> Perm(false, false)))
    assert(!roD.canRead("a") && !roD.canWrite("a"))
    // entry scoped per type: other types still follow the role
    assert(roD.canRead("b") && !roD.canWrite("b"))
    // editor with write revoked: entry verbatim for write, role for read
    val edR = User("e", "k", Set(Role.Editor), Map("a" -> Perm(true, false)))
    assert(edR.canRead("a") && !edR.canWrite("a") && edR.canWrite("b"))
    // viewer reads like read-only
    assert(User("v", "k", Set(Role.Viewer)).canRead("x"))
    // no roles, no perms: nothing
    val none = User("n", "k", Set.empty)
    assert(!none.canRead("x") && !none.canWrite("x"))
  }

  test("constant-time hex comparison semantics match equalsIgnoreCase") {
    assert(AuthManager.constantTimeEqualsHex("deadBEEF", "DEADbeef"))
    assert(!AuthManager.constantTimeEqualsHex("deadbeef", "deadbeee"))
    assert(!AuthManager.constantTimeEqualsHex("deadbeef", "deadbee")) // length
    assert(!AuthManager.constantTimeEqualsHex("deadbeef", ""))
    // verify() still accepts either case end to end
    val dir = Files.createTempDirectory("graft_auth_").toString
    val auth = new AuthManager(dir)
    auth.createUser("u", "key", Set(Role.Viewer))
    val sig = AuthManager.hmacHex("key", "msg")
    assert(auth.verify("u", "msg", sig.toUpperCase).isRight)
    assert(auth.verify("u", "msg", sig).isRight)
    assert(auth.verify("u", "msg", "00" * 32).isLeft)
  }

  test("failure tracker is bounded under a fabricated-username spray") {
    val dir = Files.createTempDirectory("graft_auth_").toString
    var now = 1000L
    val auth = new AuthManager(dir, maxFailures = 3, lockoutSeconds = 300,
      clock = () => now)
    auth.createUser("real", "key", Set(Role.Viewer))
    // lock the real user out, then spray far more fabricated names than
    // the cap: the tracker must stay bounded AND keep the LIVE lockout
    (1 to 3).foreach(_ => auth.verify("real", "m", "bad"))
    (1 to AuthManager.MaxTrackedFailures + 50).foreach { i =>
      auth.verify(s"ghost_$i", "m", "x")
    }
    assert(auth.verify("real", "m", AuthManager.hmacHex("key", "m"))
      == Left("Rate limit exceeded"))
    // once the lockout window expires, sprayed entries are prunable and
    // the real user recovers
    now += 301
    auth.verify("ghost_zzz", "m", "x") // triggers the expired-entry prune
    assert(auth.verify("real", "m", AuthManager.hmacHex("key", "m")).isRight)
  }

  test("a spray of fresher live lockouts cannot erase a victim's lockout") {
    val dir = Files.createTempDirectory("graft_auth_").toString
    var now = 1000L
    val auth = new AuthManager(dir, maxFailures = 3, lockoutSeconds = 300,
      clock = () => now)
    auth.createUser("victim", "key", Set(Role.Viewer))
    // lock the victim out FIRST (stalest timestamp in the tracker) …
    (1 to 3).foreach(_ => auth.verify("victim", "m", "bad"))
    // … then fill the tracker with LIVE lockouts on fabricated names, all
    // fresher. ADVICE r16: the old whole-map eviction fallback would evict
    // the stalest live lockout — the victim — unlocking them; now a full-
    // of-live-lockouts tracker refuses to track new names instead.
    now += 1
    (1 to AuthManager.MaxTrackedFailures + 20).foreach { i =>
      (1 to 3).foreach(_ => auth.verify(s"ghost_$i", "m", "x"))
    }
    assert(auth.verify("victim", "m", AuthManager.hmacHex("key", "m"))
      == Left("Rate limit exceeded"))
    // the window passing still recovers everyone
    now += 301
    assert(auth.verify("victim", "m", AuthManager.hmacHex("key", "m")).isRight)
  }

  test("a saturated tracker fails CLOSED for untracked names (no lockout bypass)") {
    val dir = Files.createTempDirectory("graft_auth_").toString
    var now = 1000L
    val auth = new AuthManager(dir, maxFailures = 3, lockoutSeconds = 300,
      clock = () => now)
    auth.createUser("target", "key", Set(Role.Viewer))
    // fill the tracker with LIVE ghost-name lockouts; "target" has never
    // failed, so it is untracked. ADVICE r17: the old behavior let an
    // untracked name's failures go unrecorded forever — unlimited
    // brute-force against any account the attacker kept untracked.
    (1 to AuthManager.MaxTrackedFailures + 5).foreach { i =>
      (1 to 3).foreach(_ => auth.verify(s"ghost_$i", "m", "x"))
    }
    // failed attempts on the untracked name are refused outright …
    (1 to 10).foreach { _ =>
      assert(auth.verify("target", "m", "deadbeef") == Left("Rate limit exceeded"))
    }
    // … while a CORRECT signature still authenticates (legitimate users
    // are not locked out by someone else's spray)
    assert(auth.verify("target", "m", AuthManager.hmacHex("key", "m")).isRight)
    // after the window expires the tracker drains and normal per-name
    // failure tracking resumes
    now += 301
    assert(auth.verify("target", "m", "deadbeef") == Left("Authentication failed"))
  }

  test("session tracker is a hard ceiling even when every token is live") {
    val dir = Files.createTempDirectory("graft_auth_").toString
    var now = 1000L
    val auth = new AuthManager(dir, clock = () => now, tokenTtlSeconds = 1000000)
    auth.createUser("u", "key", Set(Role.Viewer))
    val sig = AuthManager.hmacHex("key", "u")
    def tok(): String = { now += 1; auth.authenticate("u", sig).toOption.get }
    val first = tok()
    var last = first
    // ADVICE r16: minting past the cap used to grow the map unboundedly
    // when all entries were live. Now the nearest-expiry (oldest-minted,
    // with a uniform TTL) token is evicted to make room.
    (1 until AuthManager.MaxTrackedSessions + 5).foreach(_ => last = tok())
    assert(auth.validateToken(first).isEmpty,
      "oldest live token should have been evicted at the ceiling")
    assert(auth.validateToken(last).isDefined)
  }

  test("a token-minting loop evicts its own sessions first, not other users'") {
    val dir = Files.createTempDirectory("graft_auth_").toString
    var now = 1000L
    val auth = new AuthManager(dir, clock = () => now, tokenTtlSeconds = 1000000)
    auth.createUser("alice", "akey", Set(Role.Viewer))
    auth.createUser("bob", "bkey", Set(Role.Viewer))
    val aliceTok = auth.authenticate("alice", AuthManager.hmacHex("akey", "alice")).toOption.get
    // ADVICE r17: global nearest-expiry eviction always picked OTHER
    // users' tokens (fresh mints carry the latest expiry), so bob looping
    // AUTH force-logged-out alice. Same-user-first eviction keeps alice's
    // session alive through bob's entire mint storm.
    val bobSig = AuthManager.hmacHex("bkey", "bob")
    (1 to AuthManager.MaxTrackedSessions + 10).foreach { _ =>
      now += 1; auth.authenticate("bob", bobSig)
    }
    assert(auth.validateToken(aliceTok).isDefined,
      "alice's live session must survive bob's mint loop")
  }

  test("expired session tokens are pruned when the tracker fills") {
    val dir = Files.createTempDirectory("graft_auth_").toString
    var now = 1000L
    val auth = new AuthManager(dir, clock = () => now, tokenTtlSeconds = 10)
    auth.createUser("u", "key", Set(Role.Viewer))
    def tok(): String =
      auth.authenticate("u", AuthManager.hmacHex("key", "u")).toOption.get
    val t1 = tok()
    assert(auth.validateToken(t1).isDefined)
    now += 11 // t1 expires
    assert(auth.validateToken(t1).isEmpty)
    val t2 = tok()
    assert(auth.validateToken(t2).isDefined)
  }
}
