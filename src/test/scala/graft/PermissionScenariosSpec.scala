package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.auth.AuthManager

/** Protocol-level behavior parity with the reference's permissions / auth /
  * session-token scenario corpus (`tests/integration/scenarios.json`:
  * `permissions_*` (34), `revoke_key_*` (6), `auth_*` (11)). Each test
  * re-expresses one or more scenarios' semantics against our engine over
  * the rendered line protocol — fixtures are authored fresh; scenario ids
  * covered are listed in each test name's comment.
  */
class PermissionScenariosSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def newProto(authEnabled: Boolean) = new Proto(spark, authEnabled)

  private def assertIncludes(out: String, frags: String*): Unit =
    frags.foreach(f => assert(out.contains(f), s"output missing <$f>:\n$out"))
  private def assertExcludes(out: String, frags: String*): Unit =
    frags.foreach(f => assert(!out.contains(f), s"output must not contain <$f>:\n$out"))

  // permissions_grant_read_write_single_event_type, _grant_read_only,
  // _grant_write_only, _grant_multiple_event_types, _grant_merges_with_existing,
  // _multiple_grants_same_event_type
  test("grant shapes: read/write, single and multi type, merging") {
    val p = newProto(authEnabled = true)
    p.admin("""DEFINE bills FIELDS { total: "int" }""")
    p.admin("""DEFINE shipments FIELDS { weight: "int" }""")
    p.admin("""CREATE USER clerk WITH KEY "clerk-key"""")
    p.admin("GRANT READ, WRITE ON bills TO clerk")
    val both = p.admin("SHOW PERMISSIONS FOR clerk")
    assertIncludes(both, "bills: read, write")

    p.admin("""CREATE USER auditor WITH KEY "aud-key"""")
    p.admin("GRANT READ ON shipments TO auditor")
    val ro = p.admin("SHOW PERMISSIONS FOR auditor")
    assertIncludes(ro, "shipments: read")
    assertExcludes(ro, "write")

    p.admin("""CREATE USER loader WITH KEY "load-key"""")
    p.admin("GRANT WRITE ON shipments TO loader")
    val wo = p.admin("SHOW PERMISSIONS FOR loader")
    assertIncludes(wo, "shipments: write")
    assert(!wo.linesIterator.exists(_.contains("shipments: read")))

    // multi-type grant in one statement
    p.admin("""CREATE USER ops WITH KEY "ops-key"""")
    p.admin("GRANT READ, WRITE ON bills, shipments TO ops")
    val multi = p.admin("SHOW PERMISSIONS FOR ops")
    assertIncludes(multi, "bills: read, write", "shipments: read, write")

    // grants merge: READ then WRITE then redundant READ
    p.admin("""CREATE USER merger WITH KEY "merge-key"""")
    p.admin("GRANT READ ON bills TO merger")
    p.admin("GRANT WRITE ON bills TO merger")
    p.admin("GRANT READ ON bills TO merger")
    assertIncludes(p.admin("SHOW PERMISSIONS FOR merger"), "bills: read, write")
  }

  // permissions_revoke_all, _revoke_partial_read, _revoke_partial_write,
  // _revoke_multiple_event_types, _revoke_nonexistent_permission_no_error
  test("revoke shapes: full, partial, multi type, lenient on unknown types") {
    val p = newProto(authEnabled = true)
    p.admin("""DEFINE bills FIELDS { total: "int" }""")
    p.admin("""DEFINE shipments FIELDS { weight: "int" }""")

    p.admin("""CREATE USER r1 WITH KEY "k1"""")
    p.admin("GRANT READ, WRITE ON bills TO r1")
    p.admin("REVOKE READ, WRITE ON bills FROM r1")
    assertIncludes(p.admin("SHOW PERMISSIONS FOR r1"), "bills: none")

    p.admin("""CREATE USER r2 WITH KEY "k2"""")
    p.admin("GRANT READ, WRITE ON bills TO r2")
    p.admin("REVOKE READ ON bills FROM r2")
    val partial = p.admin("SHOW PERMISSIONS FOR r2")
    assertIncludes(partial, "bills: write")
    assert(!partial.linesIterator.exists(_.contains("bills: read")))

    p.admin("""CREATE USER r3 WITH KEY "k3"""")
    p.admin("GRANT READ, WRITE ON bills TO r3")
    p.admin("REVOKE WRITE ON bills FROM r3")
    val pw = p.admin("SHOW PERMISSIONS FOR r3")
    assertIncludes(pw, "bills: read")
    assertExcludes(pw, "bills: read, write")

    p.admin("""CREATE USER r4 WITH KEY "k4"""")
    p.admin("GRANT READ, WRITE ON bills, shipments TO r4")
    p.admin("REVOKE READ, WRITE ON bills, shipments FROM r4")
    assertIncludes(p.admin("SHOW PERMISSIONS FOR r4"), "bills: none", "shipments: none")

    // revoking on an event type that was never granted (or defined) is not an
    // error — it records an explicit-denial entry
    p.admin("""CREATE USER r5 WITH KEY "k5"""")
    val lenient = p.admin("REVOKE READ, WRITE ON phantom_type FROM r5")
    assertIncludes(lenient, "Permissions revoked from user 'r5'")
    assertIncludes(p.admin("SHOW PERMISSIONS FOR r5"), "phantom_type: none")
  }

  // permissions_show_empty_permissions, permissions_show_nonexistent_user_error
  test("show permissions: empty and unknown user") {
    val p = newProto(authEnabled = true)
    p.admin("""CREATE USER blank WITH KEY "bk"""")
    assertIncludes(p.admin("SHOW PERMISSIONS FOR blank"), "has no permissions")
    assertIncludes(p.admin("SHOW PERMISSIONS FOR nobody"), "User not found")
  }

  // permissions_store_requires_write_permission, _store_denied_without_write,
  // _query_requires_read_permission, _query_denied_without_read,
  // _full_workflow_read_write
  test("enforcement: store needs write, query needs read, full workflow") {
    val p = newProto(authEnabled = true)
    p.admin("""DEFINE tickets FIELDS { seat: "int", tier: "string" }""")
    p.admin("""CREATE USER writer WITH KEY "wkey"""")
    p.admin("GRANT WRITE ON tickets TO writer")
    val stored = p.as("writer", "wkey")("""STORE tickets FOR c1 PAYLOAD {"seat":7,"tier":"gold"}""")
    assertIncludes(stored, "200 OK")

    p.admin("""CREATE USER nowrite WITH KEY "nkey"""")
    p.admin("GRANT READ ON tickets TO nowrite")
    val denied = p.as("nowrite", "nkey")("""STORE tickets FOR c1 PAYLOAD {"seat":8,"tier":"silver"}""")
    assertIncludes(denied, "403 Write permission denied for event type 'tickets'")

    // reader can read back the row
    val rows = p.as("nowrite", "nkey")("QUERY tickets WHERE seat = 7")
    assertIncludes(rows, ",7,\"gold\"]")

    // write-only user is denied reads
    val qDenied = p.as("writer", "wkey")("QUERY tickets WHERE seat = 7")
    assertIncludes(qDenied, "403 Read permission denied for event type 'tickets'")

    // full read+write workflow on one user
    p.admin("""CREATE USER full WITH KEY "fkey"""")
    p.admin("GRANT READ, WRITE ON tickets TO full")
    p.as("full", "fkey")("""STORE tickets FOR c2 PAYLOAD {"seat":9,"tier":"bronze"}""")
    assertIncludes(p.as("full", "fkey")("QUERY tickets FOR c2"), "bronze")
  }

  // permissions_grant_between_commands_takes_effect,
  // permissions_grant_read_between_queries_takes_effect
  test("grants take effect between commands without restart") {
    val p = newProto(authEnabled = true)
    p.admin("""DEFINE logs FIELDS { line: "string" }""")
    p.admin("""CREATE USER late WITH KEY "lkey"""")
    val before = p.as("late", "lkey")("""STORE logs FOR c PAYLOAD {"line":"first"}""")
    assertIncludes(before, "403 Write permission denied for event type 'logs'")
    p.admin("GRANT WRITE ON logs TO late")
    val after = p.as("late", "lkey")("""STORE logs FOR c PAYLOAD {"line":"second"}""")
    assertIncludes(after, "200 OK")

    val qBefore = p.as("late", "lkey")("QUERY logs FOR c")
    assertIncludes(qBefore, "403 Read permission denied for event type 'logs'")
    p.admin("GRANT READ ON logs TO late")
    assertIncludes(p.as("late", "lkey")("QUERY logs FOR c"), "second")
  }

  // permissions_admin_can_manage_permissions, _non_admin_cannot_grant,
  // _non_admin_cannot_revoke, _non_admin_cannot_show_permissions,
  // _define_requires_admin, _admin_can_define_schema
  test("admin gates: permission management and DEFINE") {
    val p = newProto(authEnabled = true)
    assertIncludes(p.admin("""DEFINE zones FIELDS { id: "int" }"""), "200 OK")
    p.admin("""CREATE USER plain WITH KEY "pk"""")
    p.admin("""CREATE USER target WITH KEY "tk"""")

    assertIncludes(p.as("plain", "pk")("GRANT READ ON zones TO target"),
      "403 Only admin users can manage permissions")
    assertIncludes(p.as("plain", "pk")("REVOKE READ ON zones FROM target"),
      "403 Only admin users can manage permissions")
    assertIncludes(p.as("plain", "pk")("SHOW PERMISSIONS FOR target"),
      "403 Only admin users can manage permissions")
    assertIncludes(p.as("plain", "pk")("""DEFINE sneaky FIELDS { x: "int" }"""),
      "403 Only admin users can define schemas")

    p.admin("GRANT READ, WRITE ON zones TO target")
    assertIncludes(p.admin("SHOW PERMISSIONS FOR target"), "zones: read, write")
  }

  // permissions_grant_to_nonexistent_user_error,
  // permissions_revoke_from_nonexistent_user_error,
  // permissions_invalid_permission_name_error,
  // permissions_grant_to_nonexistent_event_type_error
  test("error paths: unknown user, invalid permission, undefined event type") {
    val p = newProto(authEnabled = true)
    p.admin("""DEFINE zones FIELDS { id: "int" }""")
    assertIncludes(p.admin("GRANT READ, WRITE ON zones TO phantom"), "User not found")
    assertIncludes(p.admin("REVOKE READ, WRITE ON zones FROM phantom"), "User not found")
    p.admin("""CREATE USER real WITH KEY "rk"""")
    assertIncludes(p.admin("GRANT EXECUTE ON zones TO real"), "Invalid permission")
    assertIncludes(p.admin("GRANT READ, WRITE ON undefined_zone TO real"),
      "No schema defined for event type 'undefined_zone'")
  }

  // permissions_override_read_only_role, _override_editor_role,
  // _override_write_only_role, _override_role_none_permission
  test("per-type permissions override roles") {
    val p = newProto(authEnabled = true)
    p.admin("""DEFINE metrics FIELDS { v: "int" }""")
    p.admin("""STORE metrics FOR ctx PAYLOAD {"v":42}""")

    // read-only role + write grant: can now store, still reads via role
    p.admin("""CREATE USER rvw WITH KEY "rvw-key" WITH ROLES ["read-only"]""")
    assertIncludes(p.admin("GRANT WRITE ON metrics TO rvw"), "Permissions granted to user 'rvw'")
    assertIncludes(p.as("rvw", "rvw-key")("""STORE metrics FOR ctx PAYLOAD {"v":43}"""), "200 OK")
    assertIncludes(p.as("rvw", "rvw-key")("QUERY metrics WHERE v = 43"), ",43]")

    // editor + read grant + write revoke: reads keep working, writes denied
    p.admin("""CREATE USER edi WITH KEY "edi-key" WITH ROLES ["editor"]""")
    p.admin("GRANT READ ON metrics TO edi")
    assertIncludes(p.admin("REVOKE WRITE ON metrics FROM edi"), "Permissions revoked from user 'edi'")
    assertIncludes(p.as("edi", "edi-key")("""STORE metrics FOR ctx PAYLOAD {"v":44}"""),
      "Write permission denied")
    assertIncludes(p.as("edi", "edi-key")("QUERY metrics WHERE v = 42"), ",42]")

    // write-only role + read grant: can now query
    p.admin("""CREATE USER wrt WITH KEY "wrt-key" WITH ROLES ["write-only"]""")
    p.admin("GRANT READ ON metrics TO wrt")
    assertIncludes(p.as("wrt", "wrt-key")("QUERY metrics WHERE v = 42"), ",42]")

    // revoke-all writes an explicit denial that beats the read-only role
    p.admin("""CREATE USER ro2 WITH KEY "ro2-key" WITH ROLES ["read-only"]""")
    p.admin("GRANT READ, WRITE ON metrics TO ro2")
    p.admin("REVOKE READ, WRITE ON metrics FROM ro2")
    assertIncludes(p.as("ro2", "ro2-key")("QUERY metrics WHERE v = 42"),
      "Read permission denied")
  }

  // revoke_key_revokes_session_tokens, revoke_key_preserves_user_record,
  // revoke_key_with_roles, revoke_key_error_user_not_found,
  // revoke_key_then_create_same_user_fails, revoke_key_preserves_permissions
  test("revoke key: deactivation, session kill, record/permission survival") {
    val p = newProto(authEnabled = true)
    p.admin("""DEFINE pings FIELDS { n: "int" }""")
    p.admin("""CREATE USER keyed WITH KEY "keyed-key"""")
    p.admin("GRANT READ, WRITE ON pings TO keyed")
    assertIncludes(p.admin("LIST USERS"), "keyed: active")
    assertIncludes(p.admin("SHOW PERMISSIONS FOR keyed"), "pings: read, write")

    // a live session token dies with the key
    p.authCmd("keyed", "keyed-key")
    assertIncludes(p.send("""STORE pings FOR c PAYLOAD {"n":1} TOKEN {TOKEN:keyed}"""), "200 OK")
    assertIncludes(p.admin("REVOKE KEY keyed"), "Key revoked for user 'keyed'")
    assertIncludes(p.send("""STORE pings FOR c PAYLOAD {"n":2} TOKEN {TOKEN:keyed}"""),
      "Authentication failed")
    // signature auth with the old key also dies
    assertIncludes(p.as("keyed", "keyed-key")("QUERY pings"), "Authentication failed")

    // record survives as inactive; permissions survive; recreate fails
    assertIncludes(p.admin("LIST USERS"), "keyed: inactive")
    assertIncludes(p.admin("SHOW PERMISSIONS FOR keyed"), "pings: read, write")
    assertIncludes(p.admin("""CREATE USER keyed WITH KEY "fresh-key""""), "User already exists")

    // roles don't shield from revocation
    p.admin("""CREATE USER ed3 WITH KEY "ed3-key" WITH ROLES ["editor"]""")
    assertIncludes(p.as("ed3", "ed3-key")("""STORE pings FOR c PAYLOAD {"n":3}"""), "200 OK")
    p.admin("REVOKE KEY ed3")
    assertIncludes(p.as("ed3", "ed3-key")("""STORE pings FOR c PAYLOAD {"n":4}"""),
      "Authentication failed")

    assertIncludes(p.admin("REVOKE KEY nobody_here"), "User not found")
  }

  // auth_with_token_success, _invalid_token, _inactive_user,
  // _insufficient_permissions, _query_command, _token_in_payload,
  // _empty_token, _multiple_users
  test("session tokens: lifecycle, permissions, payload collision, multiple users") {
    val p = newProto(authEnabled = true)
    p.admin("""DEFINE taps FIELDS { v: "int", token: "string | null" }""")
    p.admin("""CREATE USER tok1 WITH KEY "tok1-key"""")
    p.admin("""CREATE USER tok2 WITH KEY "tok2-key"""")
    p.admin("GRANT READ, WRITE ON taps TO tok1")
    p.admin("GRANT READ, WRITE ON taps TO tok2")

    assertIncludes(p.authCmd("tok1", "tok1-key"), "OK TOKEN")
    assertIncludes(p.send("""STORE taps FOR c PAYLOAD {"v":1} TOKEN {TOKEN:tok1}"""),
      "Event accepted")
    // a payload containing the word TOKEN doesn't confuse the suffix parser
    assertIncludes(p.send("""STORE taps FOR c PAYLOAD {"v":2,"token":"some TOKEN text"} TOKEN {TOKEN:tok1}"""),
      "Event accepted")
    // invalid and empty tokens fail
    assertIncludes(p.send("""STORE taps FOR c PAYLOAD {"v":3} TOKEN not_a_real_token"""),
      "Authentication failed")
    assertIncludes(p.send("""STORE taps FOR c PAYLOAD {"v":3} TOKEN """),
      "Authentication failed")
    // token queries honor read perms
    assertIncludes(p.send("QUERY taps WHERE v = 1 TOKEN {TOKEN:tok1}"), ",1,")
    // a read-only-role user's token cannot store
    p.admin("""CREATE USER rotok WITH KEY "rotok-key" WITH ROLES ["read-only"]""")
    p.authCmd("rotok", "rotok-key")
    assertIncludes(p.send("""STORE taps FOR c PAYLOAD {"v":9} TOKEN {TOKEN:rotok}"""),
      "Write permission denied")
    // two users' tokens stay independent
    p.authCmd("tok2", "tok2-key")
    assertIncludes(p.send("""STORE taps FOR c PAYLOAD {"v":4} TOKEN {TOKEN:tok2}"""),
      "Event accepted")
    // deactivating tok1 kills only tok1's session
    p.admin("REVOKE KEY tok1")
    assertIncludes(p.send("""STORE taps FOR c PAYLOAD {"v":5} TOKEN {TOKEN:tok1}"""),
      "Authentication failed")
    assertIncludes(p.send("""STORE taps FOR c PAYLOAD {"v":6} TOKEN {TOKEN:tok2}"""),
      "Event accepted")
  }

  // auth_create_user_and_list, auth_bypass_enabled_allows_unauthenticated_commands,
  // auth_bypass_disabled_requires_authentication
  test("auth basics: create/list, bypass on, bypass off") {
    val p = newProto(authEnabled = true)
    val created = p.admin("""CREATE USER fresh WITH KEY "fresh-key"""")
    assertIncludes(created, "User 'fresh' created", "Secret key:")
    assertIncludes(p.admin("LIST USERS"), "fresh: active")

    // bypass: unauthenticated commands work end to end
    val b = newProto(authEnabled = false)
    b.send("""DEFINE open FIELDS { v: "int" }""")
    b.send("""STORE open FOR ctx1 PAYLOAD {"v":42}""")
    assertIncludes(b.send("QUERY open WHERE v = 42"), "ctx1", "42")

    // auth on: unauthenticated commands are rejected
    val strict = newProto(authEnabled = true)
    assertIncludes(strict.send("""DEFINE closed FIELDS { v: "int" }"""),
      "Authentication failed")
  }

  // wire-protocol shape: schema/batch/end frames under 200 OK header
  test("query responses render as line-protocol JSON frames") {
    val p = newProto(authEnabled = false)
    p.send("""DEFINE fr FIELDS { v: "int" }""")
    p.send("""STORE fr FOR a PAYLOAD {"v":1}""")
    p.send("""STORE fr FOR b PAYLOAD {"v":2}""")
    val out = p.send("QUERY fr")
    assertIncludes(out, "200 OK", "\"type\":\"schema\"", "\"type\":\"batch\"",
      "\"type\":\"end\"", "\"row_count\":2")
  }
}
