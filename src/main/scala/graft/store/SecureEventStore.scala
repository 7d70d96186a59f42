package graft.store

import graft.ast._
import graft.auth.{AuthManager, Role, User}

/** Authenticated/authorized command dispatch over an [[EventStore]] —
  * the Spark analog of the reference's auth gate (`command/dispatcher.rs`,
  * `command/handlers/{define,store,permissions,auth}.rs`,
  * `frontend/tcp/listener.rs` — SURVEY.md §2.6).
  *
  * Authentication forms (reference TCP listener):
  *  - `AUTH <user>:<sig>` where sig = HMAC-SHA256(key, user_id) — issues a
  *    session token, response `OK TOKEN <token>`;
  *  - `<command> TOKEN <token>` — session-token auth;
  *  - `<command> user_id=<u> signature=<sig>` — per-command signing over the
  *    command text without the suffix (≡ the reference's inline
  *    `user:sig:command` form re-spelled as a suffix);
  *  - bypass mode (`bypassAuth = true`) — every command runs as a synthetic
  *    admin, mirroring the reference's `bypass_auth` config.
  *
  * Authorization (reference parity):
  *  - QUERY/REPLAY/COMPARE: `read` on every event type in scope;
  *  - STORE: `write` on the event type; DEFINE: admin only;
  *  - CREATE USER / REVOKE KEY / LIST USERS: admin ("manage users");
  *  - GRANT / REVOKE / SHOW PERMISSIONS: admin ("manage permissions");
  *  - SHOW: `read` on the materialization's scope; FLUSH: a write-capable
  *    user (both beyond the reference, which leaves them open — see
  *    docs/DIVERGENCES.md).
  */
final class SecureEventStore(val store: EventStore, val auth: AuthManager,
    val bypassAuth: Boolean = false) {

  private val credentialRe = """\s+user_id=(\S+)\s+signature=(\S+)\s*$""".r
  // session tokens are 32 hex chars (AuthManager.authenticate) — anchoring
  // the suffix to that charset keeps a payload string containing " TOKEN "
  // from hijacking auth routing
  private val tokenSuffixRe = """^(.*)\s+TOKEN\s+([0-9a-f]{32})\s*$""".r
  private val bypassUser = User("bypass", "", Set(Role.Admin))

  /** Bootstrap convenience: create the initial admin (no auth required when
    * no users exist yet — mirrors `[auth] initial_admin_user` config). */
  def bootstrapAdmin(name: String, key: String): Either[String, User] =
    if (auth.listUsers.nonEmpty) Left("users already exist; use CREATE USER with admin credentials")
    else auth.createUser(name, key, Set(Role.Admin))

  def execute(raw: String): ExecResult = {
    val trimmed = raw.trim
    if (bypassAuth) { // credentials, if present, are ignored in bypass mode
      val noCreds = credentialRe.replaceFirstIn(trimmed, "")
      val noToken = noCreds match {
        case tokenSuffixRe(cmd, _) => cmd.trim
        case other                 => other
      }
      return run(noToken, bypassUser)
    }

    // AUTH <user>:<sig> → session token (reference tcp/listener.rs:46-78)
    if (trimmed.length >= 5 && trimmed.substring(0, 5).equalsIgnoreCase("AUTH ")) {
      val parts = trimmed.substring(5).trim.split(":", 2)
      if (parts.length != 2)
        return ExecResult.Error("Invalid AUTH format. Use: AUTH user_id:signature", 400)
      return auth.authenticate(parts(0), parts(1)) match {
        case Right(token) => ExecResult.Ok(s"OK TOKEN $token")
        case Left(err)    => ExecResult.Error(err, 401)
      }
    }

    // <command> user_id=<u> signature=<sig> — checked FIRST: this suffix is
    // anchored at end-of-string, so a signed command whose text merely
    // contains " TOKEN " is not misrouted to token auth
    credentialRe.findFirstMatchIn(trimmed) match {
      case Some(m) =>
        val command = trimmed.substring(0, m.start)
        return auth.verify(m.group(1), command, m.group(2)) match {
          case Right(u)  => run(command, u)
          case Left(err) => ExecResult.Error(err, 401)
        }
      case None => ()
    }

    // <command> TOKEN <token> (reference tcp/listener.rs:144-186) — only a
    // trailing 32-hex token counts as token auth
    trimmed match {
      case tokenSuffixRe(command, token) =>
        auth.validateToken(token) match {
          case Some(u) => run(command.trim, u)
          case None    => ExecResult.Error("Authentication failed", 401)
        }
      case _ => ExecResult.Error("Authentication failed", 401)
    }
  }

  /** Dispatch a command for an ALREADY-authenticated user — wire layers
    * that verify credentials at the transport level (the HTTP JSON form
    * signs the raw request body, not the rendered command text) call this
    * after their own verification. Authorization still applies. */
  def executeAs(command: String, u: User): ExecResult = run(command, u)

  private def run(command: String, u: User): ExecResult = {
    val cmd = try graft.parser.CommandParser.parse(command) catch {
      case e: Exception => return ExecResult.Error(e.getMessage)
    }
    authorize(cmd, u) match {
      case Some((denied, code)) => ExecResult.Error(denied, code)
      case None                 => dispatch(cmd, u)
    }
  }

  /** Returns Some((message, statusCode)) when denied. */
  private def authorize(cmd: Command, u: User): Option[(String, Int)] = cmd match {
    case _ if u.isAdmin => None
    case q: QueryCmd =>
      val types = if (q.eventType == "*") store.eventTypes
        else q.sequence.map(s => s.head +: s.links.map(_._2)).getOrElse(Seq(q.eventType))
      types.find(t => !u.canRead(t))
        .map(t => (s"Read permission denied for event type '$t'", 403))
    case r: ReplayCmd  => authorize(r.toQuery, u)
    case c: CompareCmd => c.queries.flatMap(q => authorize(q, u)).headOption
    case s: StoreCmd =>
      if (u.canWrite(s.eventType)) None
      else Some((s"Write permission denied for event type '${s.eventType}'", 403))
    case _: DefineCmd => Some(("Only admin users can define schemas", 403))
    case rem: RememberCmd => authorize(rem.query, u)
    case ShowCmd(name) =>
      new Materializer(store).storedQuery(name).flatMap { q =>
        val types = if (q.eventType == "*") store.eventTypes
          else q.sequence.map(s => s.head +: s.links.map(_._2)).getOrElse(Seq(q.eventType))
        types.find(t => !u.canRead(t))
          .map(t => (s"Read permission denied for event type '$t'", 403))
      }
    case FlushCmd =>
      val writeCapable = u.roles.exists(r => r == Role.Editor || r == Role.WriteOnly) ||
        u.permissions.values.exists(_.write)
      if (writeCapable) None else Some(("Write permission denied", 403))
    case PingCmd        => None
    case BatchCmd(cmds) => cmds.flatMap(c => authorize(c, u)).headOption
    case _: CreateUserCmd | _: RevokeKeyCmd | ListUsersCmd =>
      Some(("Only admin users can manage users", 403))
    case _: GrantCmd | _: RevokePermCmd | _: ShowPermissionsCmd =>
      Some(("Only admin users can manage permissions", 403))
  }

  private def dispatch(cmd: Command, u: User): ExecResult = cmd match {
    case CreateUserCmd(name, key, roleNames) =>
      val roles = roleNames.flatMap(Role.parse).toSet
      if (roles.size != roleNames.size)
        ExecResult.Error(s"unknown role in ${roleNames.mkString(", ")}")
      else {
        val secret = key.getOrElse(java.util.UUID.randomUUID().toString.replace("-", ""))
        auth.createUser(name, secret, roles)
          .fold(e => ExecResult.Error(e),
            nu => ExecResult.Ok(s"User '${nu.name}' created\nSecret key: ${nu.key}"))
      }

    case GrantCmd(perms, eventTypes, user) =>
      val addRead = perms.exists(_.equalsIgnoreCase("read"))
      val addWrite = perms.exists(_.equalsIgnoreCase("write"))
      // granting on an undefined event type is an error (reference
      // permissions.rs:67-78); revoke below stays lenient
      eventTypes.find(et => !store.eventTypes.contains(et)) match {
        case Some(missing) =>
          ExecResult.Error(s"No schema defined for event type '$missing'")
        case None =>
          val failed = eventTypes.iterator
            .map(et => auth.grant(user, et, addRead, addWrite))
            .collectFirst { case Left(e) => e }
          failed.fold[ExecResult](ExecResult.Ok(s"Permissions granted to user '$user'"))(
            e => ExecResult.Error(s"Failed to grant permission: $e"))
      }

    case RevokePermCmd(perms, eventTypes, user) =>
      // empty permission list ⇒ revoke both (reference permissions.rs:140-141)
      val dropRead = perms.isEmpty || perms.exists(_.equalsIgnoreCase("read"))
      val dropWrite = perms.isEmpty || perms.exists(_.equalsIgnoreCase("write"))
      val failed = eventTypes.iterator
        .map(et => auth.revoke(user, et, dropRead, dropWrite))
        .collectFirst { case Left(e) => e }
      failed.fold[ExecResult](ExecResult.Ok(s"Permissions revoked from user '$user'"))(
        e => ExecResult.Error(s"Failed to revoke permission: $e"))

    case RevokeKeyCmd(user) =>
      auth.revokeKey(user).fold(e => ExecResult.Error(e),
        _ => ExecResult.Ok(s"Key revoked for user '$user'"))

    case ListUsersCmd =>
      val users = auth.listUsers
      if (users.isEmpty) ExecResult.Ok("No users found")
      else ExecResult.Ok(users.map(u2 =>
        s"${u2.name}: ${if (u2.active) "active" else "inactive"}").mkString("\n"))

    case ShowPermissionsCmd(name) =>
      auth.get(name) match {
        case None => ExecResult.Error(s"User not found: $name")
        case Some(u2) if u2.permissions.isEmpty =>
          ExecResult.Ok(s"User '$name' has no permissions")
        case Some(u2) =>
          val lines = s"Permissions for user '$name':" +:
            u2.permissions.toSeq.sortBy(_._1).map { case (et, p) => s"  $et: ${p.render}" }
          ExecResult.Ok(lines.mkString("\n"))
      }

    case other => store.execute(other)
  }
}

object SecureEventStore {
  private val credentialSuffixRe = """\s+user_id=\S+\s+signature=\S+\s*$""".r
  private val tokenSuffixProbe = """(?s)^.*\s+TOKEN\s+[0-9a-f]{32}\s*$"""

  /** True when the command text ends with its own credentials — the SAME
    * anchored suffix forms [[SecureEventStore.execute]] routes on. Frontends
    * use this to decide whether to append a connection-level session token;
    * a substring test (e.g. `contains("user_id=")`) would misfire on payload
    * text that merely mentions the marker and 401 an authenticated line. */
  def hasCredentialSuffix(t: String): Boolean =
    credentialSuffixRe.findFirstIn(t).isDefined || t.matches(tokenSuffixProbe)
}
