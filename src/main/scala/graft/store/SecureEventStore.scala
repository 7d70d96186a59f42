package graft.store

import graft.ast._
import graft.auth.{AuthManager, Role, User}

/** Authenticated/authorized command dispatch over an [[EventStore]] —
  * the Spark analog of the reference's auth gate in `command/dispatcher.rs`
  * (SURVEY.md §2.6).
  *
  * Credentials ride as a command suffix `… user_id=<u> signature=<sig>`
  * (the shape the reference's integration scenarios use); the signature is
  * HMAC-SHA256 over the command text WITHOUT the suffix. Authorization:
  *
  *  - QUERY/REPLAY/sequences: `read` on every event type in scope;
  *  - STORE / DEFINE / FLUSH / REMEMBER: `write` (REMEMBER also `read`);
  *  - user management (CREATE USER / GRANT / REVOKE / LIST USERS /
  *    SHOW PERMISSIONS / REVOKE KEY): admin only;
  *  - BATCH: every contained command must be authorized.
  */
final class SecureEventStore(val store: EventStore, val auth: AuthManager) {

  private val credentialRe = """\s+user_id=(\S+)\s+signature=(\S+)\s*$""".r

  /** Bootstrap convenience: create the initial admin (no auth required when
    * no users exist yet — mirrors first-boot setup). */
  def bootstrapAdmin(name: String, key: String): Either[String, User] =
    if (auth.listUsers.nonEmpty) Left("users already exist; use CREATE USER with admin credentials")
    else auth.createUser(name, key, Set(Role.Admin))

  def execute(raw: String): ExecResult = {
    val (command, creds) = splitCredentials(raw)
    val user: Either[String, User] = creds match {
      case Some((u, sig)) => auth.verify(u, command, sig)
      case None           => Left("missing credentials (append 'user_id=<u> signature=<sig>')")
    }
    user match {
      case Left(err) => ExecResult.Error(s"auth: $err")
      case Right(u) =>
        val cmd = try graft.parser.CommandParser.parse(command) catch {
          case e: Exception => return ExecResult.Error(e.getMessage)
        }
        authorize(cmd, u) match {
          case Some(denied) => ExecResult.Error(s"permission denied: $denied")
          case None         => dispatch(cmd, u)
        }
    }
  }

  private def splitCredentials(raw: String): (String, Option[(String, String)]) =
    credentialRe.findFirstMatchIn(raw) match {
      case Some(m) => (raw.substring(0, m.start), Some((m.group(1), m.group(2))))
      case None    => (raw, None)
    }

  /** Returns Some(reason) when denied. */
  private def authorize(cmd: Command, u: User): Option[String] = cmd match {
    case q: QueryCmd =>
      val types = if (q.eventType == "*") store.eventTypes
        else q.sequence.map(s => s.head +: s.links.map(_._2)).getOrElse(Seq(q.eventType))
      types.find(t => !u.canRead(t)).map(t => s"read on '$t'")
    case r: ReplayCmd => authorize(r.toQuery, u)
    case c: CompareCmd => c.queries.flatMap(q => authorize(q, u)).headOption
    case s: StoreCmd  => if (u.canWrite(s.eventType)) None else Some(s"write on '${s.eventType}'")
    case d: DefineCmd => if (u.canWrite(d.eventType)) None else Some(s"write on '${d.eventType}'")
    case rem: RememberCmd =>
      authorize(rem.query, u).orElse(
        if (u.canWrite(rem.query.eventType)) None else Some(s"write on '${rem.query.eventType}'"))
    case ShowCmd(_) | FlushCmd | PingCmd => None
    case BatchCmd(cmds) => cmds.flatMap(c => authorize(c, u)).headOption
    case _: CreateUserCmd | _: GrantCmd | _: RevokePermCmd | _: RevokeKeyCmd |
         ListUsersCmd | _: ShowPermissionsCmd =>
      if (u.isAdmin) None else Some("admin role required")
  }

  private def dispatch(cmd: Command, u: User): ExecResult = cmd match {
    case CreateUserCmd(name, key, roleNames) =>
      val roles = roleNames.flatMap(Role.parse).toSet
      if (roles.size != roleNames.size)
        ExecResult.Error(s"unknown role in ${roleNames.mkString(", ")}")
      else auth.createUser(name, key.getOrElse(java.util.UUID.randomUUID().toString.replace("-", "")), roles)
        .fold(ExecResult.Error.apply, nu => ExecResult.Ok(s"created user ${nu.name}"))
    case GrantCmd(perms, tpe, user) =>
      // reference parity: granting on an undefined event type is an error
      // (revoke stays lenient — removing a permission that isn't there is a
      // no-op in the reference)
      if (!store.eventTypes.contains(tpe))
        ExecResult.Error(s"no schema defined for event type '$tpe'")
      else perms.foldLeft[Either[String, User]](Right(null)) { (acc, p) =>
        acc.flatMap(_ => auth.grant(user, p, tpe))
      }.fold(ExecResult.Error.apply, _ => ExecResult.Ok(s"granted ${perms.mkString(", ")} on $tpe to $user"))
    case RevokePermCmd(perms, tpe, user) =>
      perms.foldLeft[Either[String, User]](Right(null)) { (acc, p) =>
        acc.flatMap(_ => auth.revoke(user, p, tpe))
      }.fold(ExecResult.Error.apply, _ => ExecResult.Ok(s"revoked ${perms.mkString(", ")} on $tpe from $user"))
    case RevokeKeyCmd(user) =>
      auth.revokeKey(user).fold(ExecResult.Error.apply, k => ExecResult.Ok(s"new key for $user: $k"))
    case ListUsersCmd =>
      ExecResult.Ok(auth.listUsers.map(u2 =>
        s"${u2.name} [${u2.roles.toSeq.map(Role.render).sorted.mkString(", ")}]").mkString("; "))
    case ShowPermissionsCmd(name) =>
      auth.get(name) match {
        case None => ExecResult.Error(s"unknown user: $name")
        case Some(u2) => ExecResult.Ok(
          s"roles=${u2.roles.toSeq.map(Role.render).sorted.mkString(",")} " +
          s"reads=${u2.reads.toSeq.sorted.mkString(",")} writes=${u2.writes.toSeq.sorted.mkString(",")}")
      }
    case other => store.execute(other)
  }
}
