package graft.auth

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Authentication/authorization layer (reference `src/engine/auth/`,
  * `docs/src/commands/user_management.md` — SURVEY.md §2.6).
  *
  * Reproduced surface: named users with API keys; roles `admin | editor |
  * read-only | viewer | write-only`; per-event-type `PermissionSet`s that
  * OVERRIDE roles (reference `auth/types.rs` `PermissionCache::can_read/
  * can_write`); HMAC-SHA256 request signing; session tokens (`AUTH` →
  * token; reference `frontend/tcp/listener.rs:37-78`); REVOKE KEY
  * deactivates the user and kills their sessions (reference
  * `auth/user_ops.rs`); failed-auth lockout. Users persist as JSON under
  * the store root.
  */
object Role extends Enumeration {
  val Admin, Editor, ReadOnly, Viewer, WriteOnly = Value

  def parse(s: String): Option[Value] = s.toLowerCase.replace("_", "-") match {
    case "admin"              => Some(Admin)
    case "editor"             => Some(Editor)
    case "read-only" | "readonly" => Some(ReadOnly)
    case "viewer"             => Some(Viewer)
    case "write-only" | "writeonly" => Some(WriteOnly)
    case _                    => None
  }
  def render(r: Value): String = r match {
    case Admin => "admin"; case Editor => "editor"; case ReadOnly => "read-only"
    case Viewer => "viewer"; case WriteOnly => "write-only"
  }
}

/** Per-event-type read/write grant — reference `auth/types.rs` `PermissionSet`.
  * An entry with both flags false is an EXPLICIT DENIAL (written by REVOKE)
  * that overrides any role-derived access. */
final case class Perm(read: Boolean, write: Boolean) {
  def render: String =
    if (read && write) "read, write"
    else if (read) "read"
    else if (write) "write"
    else "none"
}

final case class User(
    name: String,
    key: String,
    roles: Set[Role.Value],
    permissions: Map[String, Perm] = Map.empty,
    active: Boolean = true) {

  def isAdmin: Boolean = roles.contains(Role.Admin)
  private def roleReads: Boolean =
    roles.exists(r => r == Role.Editor || r == Role.ReadOnly || r == Role.Viewer)
  private def roleWrites: Boolean =
    roles.exists(r => r == Role.Editor || r == Role.WriteOnly)

  /** Priority: admin > per-type permission > role. A write-only entry falls
    * through to the role for READ; a none() entry denies outright
    * (reference `PermissionCache::can_read`). */
  def canRead(eventType: String): Boolean =
    if (isAdmin) true
    else permissions.get(eventType) match {
      case Some(p) if p.read             => true
      case Some(p) if !p.read && !p.write => false // explicit denial
      case _                             => roleReads // no entry, or write-only entry
    }

  /** A permission entry overrides the role completely for WRITE
    * (reference `PermissionCache::can_write`). */
  def canWrite(eventType: String): Boolean =
    if (isAdmin) true
    else permissions.get(eventType) match {
      case Some(p) => p.write
      case None    => roleWrites
    }
}

final class AuthManager(root: String, maxFailures: Int = 5,
    lockoutSeconds: Long = 300, clock: () => Long = () => System.currentTimeMillis() / 1000,
    tokenTtlSeconds: Long = 3600) {

  private val file = Paths.get(root, "_auth", "users.json")
  private val users = mutable.LinkedHashMap.empty[String, User]
  private val failures = mutable.Map.empty[String, (Int, Long)] // name -> (count, lastFail)
  private val sessions = mutable.Map.empty[String, (String, Long)] // token -> (user, expiry)

  Files.createDirectories(file.getParent)
  load()

  def createUser(name: String, key: String, roles: Set[Role.Value]): Either[String, User] = {
    if (users.contains(name)) Left("User already exists")
    else {
      val u = User(name, key, roles)
      users(name) = u; save(); Right(u)
    }
  }

  /** GRANT merges: existing OR requested (reference `permissions.rs:89-93`). */
  def grant(name: String, eventType: String, addRead: Boolean, addWrite: Boolean): Either[String, User] =
    modify(name) { u =>
      val existing = u.permissions.getOrElse(eventType, Perm(false, false))
      val merged = Perm(existing.read || addRead, existing.write || addWrite)
      Right(u.copy(permissions = u.permissions + (eventType -> merged)))
    }

  /** REVOKE always writes the resulting entry — a both-false entry is an
    * explicit denial overriding roles (reference `permissions.rs:152-163`). */
  def revoke(name: String, eventType: String, dropRead: Boolean, dropWrite: Boolean): Either[String, User] =
    modify(name) { u =>
      val existing = u.permissions.getOrElse(eventType, Perm(false, false))
      val reduced = Perm(existing.read && !dropRead, existing.write && !dropWrite)
      Right(u.copy(permissions = u.permissions + (eventType -> reduced)))
    }

  /** REVOKE KEY deactivates the user and revokes their session tokens
    * (reference: `revoke_key_preserves_user_record` scenario — the user
    * stays listed as inactive; permissions survive). */
  def revokeKey(name: String): Either[String, Unit] =
    modify(name)(u => Right(u.copy(active = false))).map { _ =>
      sessions.filterInPlace { case (_, (owner, _)) => owner != name }
    }

  def listUsers: Seq[User] = users.values.toSeq
  def get(name: String): Option[User] = users.get(name)

  /** HMAC-SHA256 request verification with failed-auth lockout. Errors are
    * deliberately generic (reference `AuthError::AuthenticationFailed`
    * prevents user enumeration). */
  def verify(name: String, message: String, signatureHex: String): Either[String, User] = {
    users.get(name) match {
      case None => fail(name)
      case Some(u) =>
        failures.get(name) match {
          case Some((n, last)) if n >= maxFailures && clock() - last < lockoutSeconds =>
            return Left("Rate limit exceeded")
          case _ => ()
        }
        if (!u.active) fail(name)
        else if (AuthManager.constantTimeEqualsHex(
            AuthManager.hmacHex(u.key, message), signatureHex)) {
          failures.remove(name); Right(u)
        } else fail(name)
    }
  }

  private def fail(name: String): Either[String, User] = {
    // Bound the tracker: a client spraying fabricated user names would
    // otherwise grow this map without limit (each failed name costs an
    // entry forever). Past the cap, first drop entries whose lockout
    // window has fully expired (they no longer influence any decision),
    // then — only if genuinely full of LIVE entries — drop the stalest.
    if (!failures.contains(name) && failures.size >= AuthManager.MaxTrackedFailures) {
      val now = clock()
      failures.filterInPlace { case (_, (_, last)) => now - last < lockoutSeconds }
      if (failures.size >= AuthManager.MaxTrackedFailures) {
        // never evict a LIVE lockout — otherwise a spray of fabricated
        // names with fresher timestamps would erase a victim's lockout
        // (ADVICE r16: the old whole-map fallback did exactly that). When
        // every tracked entry is a live lockout, FAIL CLOSED for the
        // untracked name (ADVICE r17: letting it through untracked meant
        // an attacker who saturated the tracker with ghost-name lockouts
        // could brute-force any untracked real account with zero rate
        // limiting — the saturation itself is attack evidence). The
        // refusal message matches the lockout path, so it leaks nothing
        // about whether the name exists.
        val unlocked = failures.filter { case (_, (n, _)) => n < maxFailures }
        if (unlocked.isEmpty) return Left("Rate limit exceeded")
        failures.remove(unlocked.minBy(_._2._2)._1): Unit
      }
    }
    val (n, _) = failures.getOrElse(name, (0, 0L))
    failures(name) = (n + 1, clock())
    Left("Authentication failed")
  }

  /** `AUTH user:sig` where sig = HMAC(key, user_id) — issues a session token
    * (reference `tcp/listener.rs:46-78`). */
  def authenticate(name: String, signatureHex: String): Either[String, String] =
    verify(name, name, signatureHex).map { _ =>
      // expired tokens are otherwise only removed when THAT token is next
      // presented — a long-lived server would accrete them forever
      if (sessions.size >= AuthManager.MaxTrackedSessions) {
        val now = clock()
        sessions.filterInPlace { case (_, (_, expiry)) => now <= expiry }
        // MaxTrackedSessions is a CEILING, not just a prune trigger
        // (ADVICE r16: an authenticated client minting tokens in a loop
        // grew the map unboundedly for a full TTL window). If the map is
        // still full of LIVE tokens, evict the MINTING user's own
        // nearest-expiry token first (ADVICE r17: global nearest-expiry
        // always picked OTHER users' tokens — fresh mints carry the
        // latest expiry — so one client looping AUTH force-logged-out
        // every concurrent user). Only when the minter holds no live
        // token does the global nearest-expiry fallback run.
        while (sessions.size >= AuthManager.MaxTrackedSessions) {
          val own = sessions.filter { case (_, (who, _)) => who == name }
          val victim =
            if (own.nonEmpty) own.minBy(_._2._2)._1
            else sessions.minBy(_._2._2)._1
          sessions.remove(victim): Unit
        }
      }
      val token = java.util.UUID.randomUUID().toString.replace("-", "")
      sessions(token) = (name, clock() + tokenTtlSeconds)
      token
    }

  /** Validate a session token → user (active, unexpired). */
  def validateToken(token: String): Option[User] =
    sessions.get(token).flatMap { case (name, expiry) =>
      if (clock() > expiry) { sessions.remove(token); None }
      else users.get(name).filter(_.active)
    }

  private def modify(name: String)(f: User => Either[String, User]): Either[String, User] =
    users.get(name) match {
      case None => Left(s"User not found: $name")
      case Some(u) => f(u).map { nu => users(name) = nu; save(); nu }
    }

  // ---- persistence (jackson, same as the schema catalog) ----
  private def save(): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    users.values.foreach { u =>
      val n = arr.addObject()
      n.put("name", u.name); n.put("key", u.key); n.put("active", u.active)
      val rl = n.putArray("roles"); u.roles.toSeq.map(Role.render).sorted.foreach(rl.add)
      val ps = n.putObject("permissions")
      u.permissions.toSeq.sortBy(_._1).foreach { case (et, p) =>
        val e = ps.putObject(et); e.put("read", p.read); e.put("write", p.write)
      }
    }
    Files.write(file, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(arr))
  }

  private def load(): Unit = {
    if (!Files.exists(file)) return
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(Files.readAllBytes(file))
    arr.elements().asScala.foreach { n =>
      val perms = mutable.LinkedHashMap.empty[String, Perm]
      if (n.has("permissions")) {
        n.get("permissions").properties().asScala.foreach { e =>
          perms(e.getKey) = Perm(e.getValue.get("read").asBoolean(), e.getValue.get("write").asBoolean())
        }
      }
      // legacy round-1 format: reads/writes string arrays
      if (n.has("reads")) n.get("reads").elements().asScala.foreach { r =>
        val et = r.asText(); val p = perms.getOrElse(et, Perm(false, false))
        perms(et) = p.copy(read = true)
      }
      if (n.has("writes")) n.get("writes").elements().asScala.foreach { w =>
        val et = w.asText(); val p = perms.getOrElse(et, Perm(false, false))
        perms(et) = p.copy(write = true)
      }
      users(n.get("name").asText()) = User(
        n.get("name").asText(), n.get("key").asText(),
        n.get("roles").elements().asScala.flatMap(r => Role.parse(r.asText())).toSet,
        perms.toMap,
        active = !n.has("active") || n.get("active").asBoolean())
    }
  }
}

object AuthManager {

  /** Ceilings for the failed-auth and session-token trackers — far above
    * any legitimate population, purely an adversarial-memory bound. */
  val MaxTrackedFailures: Int = 16384
  val MaxTrackedSessions: Int = 65536

  /** Constant-time, case-insensitive comparison of two hex strings —
    * signature checks must not leak the match prefix length through
    * timing (`equalsIgnoreCase` short-circuits at the first mismatch).
    * `MessageDigest.isEqual` is the JDK's documented constant-time
    * byte comparison; hex is ASCII so lowercasing normalizes case
    * without touching length. */
  def constantTimeEqualsHex(expectedHex: String, providedHex: String): Boolean =
    java.security.MessageDigest.isEqual(
      expectedHex.toLowerCase(java.util.Locale.ROOT).getBytes(StandardCharsets.UTF_8),
      providedHex.toLowerCase(java.util.Locale.ROOT).getBytes(StandardCharsets.UTF_8))

  def hmacHex(key: String, message: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(message.getBytes(StandardCharsets.UTF_8)).map(b => f"$b%02x").mkString
  }
}
