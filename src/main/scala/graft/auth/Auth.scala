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
  * read-only | viewer | write-only`; per-event-type read/write grants on top
  * of the role; HMAC-SHA256 request signing; failed-auth rate limiting
  * (lockout after repeated failures). Users persist as JSON under the store
  * root. Deliberately thin — authorization gates command dispatch; it is
  * orthogonal to the query engine itself (the reference treats it the same
  * way).
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

final case class User(
    name: String,
    key: String,
    roles: Set[Role.Value],
    reads: Set[String] = Set.empty,   // per-event-type grants beyond the roles
    writes: Set[String] = Set.empty) {

  def canRead(eventType: String): Boolean =
    roles.exists(r => r == Role.Admin || r == Role.Editor || r == Role.ReadOnly || r == Role.Viewer) ||
      reads.contains(eventType)
  def canWrite(eventType: String): Boolean =
    roles.exists(r => r == Role.Admin || r == Role.Editor || r == Role.WriteOnly) ||
      writes.contains(eventType)
  def isAdmin: Boolean = roles.contains(Role.Admin)
}

final class AuthManager(root: String, maxFailures: Int = 5,
    lockoutSeconds: Long = 300, clock: () => Long = () => System.currentTimeMillis() / 1000) {

  private val file = Paths.get(root, "_auth", "users.json")
  private val users = mutable.LinkedHashMap.empty[String, User]
  private val failures = mutable.Map.empty[String, (Int, Long)] // name -> (count, lastFail)

  Files.createDirectories(file.getParent)
  load()

  def createUser(name: String, key: String, roles: Set[Role.Value]): Either[String, User] = {
    if (users.contains(name)) Left(s"user '$name' already exists")
    else {
      val u = User(name, key, roles)
      users(name) = u; save(); Right(u)
    }
  }

  def grant(name: String, perm: String, eventType: String): Either[String, User] =
    modify(name) { u =>
      perm.toLowerCase match {
        case "read"  => Right(u.copy(reads = u.reads + eventType))
        case "write" => Right(u.copy(writes = u.writes + eventType))
        case other   => Left(s"unknown permission: $other (expected read|write)")
      }
    }

  def revoke(name: String, perm: String, eventType: String): Either[String, User] =
    modify(name) { u =>
      perm.toLowerCase match {
        case "read"  => Right(u.copy(reads = u.reads - eventType))
        case "write" => Right(u.copy(writes = u.writes - eventType))
        case other   => Left(s"unknown permission: $other (expected read|write)")
      }
    }

  /** Rotate out a compromised key (reference REVOKE KEY). */
  def revokeKey(name: String): Either[String, String] = {
    val newKey = java.util.UUID.randomUUID().toString.replace("-", "")
    modify(name)(u => Right(u.copy(key = newKey))).map(_ => newKey)
  }

  def listUsers: Seq[User] = users.values.toSeq
  def get(name: String): Option[User] = users.get(name)

  /** HMAC-SHA256 request verification with failed-auth lockout
    * (reference auth rate limiting). */
  def verify(name: String, command: String, signatureHex: String): Either[String, User] = {
    users.get(name) match {
      case None => Left(s"unknown user: $name")
      case Some(u) =>
        failures.get(name) match {
          case Some((n, last)) if n >= maxFailures && clock() - last < lockoutSeconds =>
            return Left(s"user '$name' locked out after $n failed attempts")
          case _ => ()
        }
        if (AuthManager.hmacHex(u.key, command).equalsIgnoreCase(signatureHex)) {
          failures.remove(name); Right(u)
        } else {
          val (n, _) = failures.getOrElse(name, (0, 0L))
          failures(name) = (n + 1, clock())
          Left("invalid signature")
        }
    }
  }

  private def modify(name: String)(f: User => Either[String, User]): Either[String, User] =
    users.get(name) match {
      case None => Left(s"unknown user: $name")
      case Some(u) => f(u).map { nu => users(name) = nu; save(); nu }
    }

  // ---- persistence (jackson, same as the schema catalog) ----
  private def save(): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    users.values.foreach { u =>
      val n = arr.addObject()
      n.put("name", u.name); n.put("key", u.key)
      val rl = n.putArray("roles"); u.roles.toSeq.map(Role.render).sorted.foreach(rl.add)
      val r = n.putArray("reads"); u.reads.toSeq.sorted.foreach(r.add)
      val w = n.putArray("writes"); u.writes.toSeq.sorted.foreach(w.add)
    }
    Files.write(file, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(arr))
  }

  private def load(): Unit = {
    if (!Files.exists(file)) return
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(Files.readAllBytes(file))
    arr.elements().asScala.foreach { n =>
      users(n.get("name").asText()) = User(
        n.get("name").asText(), n.get("key").asText(),
        n.get("roles").elements().asScala.flatMap(r => Role.parse(r.asText())).toSet,
        n.get("reads").elements().asScala.map(_.asText()).toSet,
        n.get("writes").elements().asScala.map(_.asText()).toSet)
    }
  }
}

object AuthManager {
  def hmacHex(key: String, message: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(message.getBytes(StandardCharsets.UTF_8)).map(b => f"$b%02x").mkString
  }
}
