package graft.frontend

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.ast._
import graft.store.{ExecResult, Responses, SecureEventStore}

/** HTTP frontend (reference `src/frontend/http/{handler,dispatcher}.rs`;
  * SURVEY.md §2 S9): a thin wire layer over [[SecureEventStore.execute]] —
  * all parsing, auth and authorization live in the engine, the frontend only
  * moves bytes. JDK `com.sun.net.httpserver`, no extra dependencies.
  *
  * Routes (reference `handler.rs:93-114`):
  *  - `POST /command`       — line-protocol command in the body;
  *  - `POST /json-command`  — JSON command object (reference
  *    `json_command.rs` tagged `type` form);
  *  - anything else         — 404 `Not Found`; non-POST — 405.
  *
  * Authentication (reference `dispatcher.rs:126-200`): header pair
  * `X-Auth-User` / `X-Auth-Signature` (HMAC-SHA256 over the trimmed body —
  * rewritten to the engine's credential-suffix form), else the body's own
  * inline credential/`TOKEN`/`AUTH` forms pass through untouched.
  *
  * Responses: HTTP status = engine status code; body is the line protocol
  * ([[Responses.render]]) in the default `unix` output format, or an Arrow
  * IPC stream for result frames when constructed with
  * `outputFormat = "arrow"` (errors stay JSON, reference
  * `dispatcher.rs:415-428`). Every command response carries
  * `X-Execution-Time-Ms` (reference `dispatcher.rs:524-534`).
  *
  * Scale note: the frontend streams frames through
  * `toLocalIterator`/batched Arrow writes — a result never has to fit in
  * driver memory beyond one partition.
  */
final class HttpFrontend(engine: SecureEventStore, port: Int = 0,
    outputFormat: String = "unix") {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", exchange => handle(exchange))
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)

  /** Start listening; returns the bound port (use port=0 for ephemeral). */
  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = { server.stop(0); pool.shutdownNow() }

  // ---------------- routing ----------------

  private def handle(x: HttpExchange): Unit =
    try {
      x.getRequestURI.getPath match {
        case "/command" | "/json-command" if x.getRequestMethod != "POST" =>
          plain(x, 405, "Method Not Allowed")
        case "/command"      => command(x, json = false)
        case "/json-command" => command(x, json = true)
        case _               => plain(x, 404, "Not Found")
      }
    } catch {
      case e: Exception => plain(x, 500, s"Execution error: ${e.getMessage}")
    } finally x.close()

  private def command(x: HttpExchange, json: Boolean): Unit = {
    // same 64 MiB command ceiling as the WS frames: an unbounded
    // readAllBytes would let one oversized POST exhaust the heap
    val raw = x.getRequestBody.readNBytes(HttpFrontend.MaxBodyBytes + 1)
    if (raw.length > HttpFrontend.MaxBodyBytes)
      return respond(x, ExecResult.Error("Payload too large", 413), 0)
    val body = new String(raw, UTF_8).trim
    if (body.isEmpty) return respond(x, ExecResult.Error("Empty command", 400), 0)

    val t0 = System.nanoTime()
    val result: ExecResult =
      if (json) runJson(x, body)
      else {
        // header auth rewrites to the engine's credential-suffix form; the
        // signature covers the trimmed body, which is exactly what the
        // engine verifies after stripping the suffix
        val line = headerAuth(x) match {
          case Some((u, sig)) => s"$body user_id=$u signature=$sig"
          case None           => body
        }
        if (targetsProtectedContext(body))
          ExecResult.Error("System contexts are restricted", 403)
        else engine.execute(line)
      }
    respond(x, result, (System.nanoTime() - t0) / 1e6)
  }

  private def headerAuth(x: HttpExchange): Option[(String, String)] = {
    val h = x.getRequestHeaders
    (Option(h.getFirst("X-Auth-User")), Option(h.getFirst("X-Auth-Signature"))) match {
      case (Some(u), Some(s)) if u.nonEmpty && s.nonEmpty => Some((u, s))
      case _                                              => None
    }
  }

  // ---------------- JSON command form ----------------

  /** `{"type": "Define|Store|Query|Replay|Ping|Flush|Batch", ...}` —
    * reference `json_command.rs`. Converted to command text and dispatched
    * through the same engine path as `/command` (auth included). */
  private def runJson(x: HttpExchange, body: String): ExecResult =
    JsonCommands.toCommandText(body) match {
      case Left(err) => ExecResult.Error(s"Invalid JSON command: $err", 400)
      case Right(text) =>
        if (targetsProtectedContext(text))
          ExecResult.Error("System contexts are restricted", 403)
        else if (engine.bypassAuth) engine.execute(text)
        else headerAuth(x) match {
          // reference signs the raw JSON body (dispatcher.rs:315-330) — the
          // frontend verifies that signature, then dispatches pre-authed
          case Some((u, sig)) =>
            engine.auth.verify(u, body, sig) match {
              case Right(user) => engine.executeAs(text, user)
              case Left(err)   => ExecResult.Error(err, 401)
            }
          case None => ExecResult.Error(
            "Authentication required: missing X-Auth-User and X-Auth-Signature headers", 401)
        }
    }

  // ---------------- protected contexts ----------------

  private val credentialRe = """\s+user_id=\S+\s+signature=\S+\s*$""".r
  private val tokenRe = """\s+TOKEN\s+[0-9a-f]{32}\s*$""".r

  /** `__system_*` contexts are wire-inaccessible (reference
    * `dispatcher.rs:22-45`). Checked on the bare command text; a command the
    * engine can't parse falls through to the engine's own error. */
  private def targetsProtectedContext(command: String): Boolean = {
    val bare = tokenRe.replaceFirstIn(credentialRe.replaceFirstIn(command, ""), "")
    def prot(c: Option[String]): Boolean = c.exists(_.startsWith("__system_"))
    def inCmd(cmd: Command): Boolean = cmd match {
      case s: StoreCmd      => s.contextId.startsWith("__system_")
      case q: QueryCmd      => prot(q.contextId)
      case r: ReplayCmd     => r.contextId.startsWith("__system_")
      case rem: RememberCmd => inCmd(rem.query)
      case c: CompareCmd    => c.queries.exists(inCmd)
      case BatchCmd(cmds)   => cmds.exists(inCmd)
      case _                => false
    }
    scala.util.Try(graft.parser.CommandParser.parse(bare)).toOption.exists(inCmd)
  }

  // ---------------- response rendering ----------------

  private def respond(x: HttpExchange, r: ExecResult, ms: Double): Unit = {
    x.getResponseHeaders.set("X-Execution-Time-Ms", f"$ms%.3f")
    r match {
      case ExecResult.Frame(df) if outputFormat == "arrow" =>
        // Arrow IPC stream for result frames; non-frame responses fall back
        // to JSON (reference arrow.rs:20-76)
        val bytes = Responses.arrowFrame(df)
        x.getResponseHeaders.set("Content-Type", "application/vnd.apache.arrow.stream")
        x.sendResponseHeaders(200, bytes.length)
        x.getResponseBody.write(bytes)
      case ExecResult.Ok(msg) if outputFormat == "arrow" =>
        sendJson(x, 200, msg)
      case ExecResult.Error(msg, code) if outputFormat == "arrow" =>
        sendJson(x, code, msg)
      case other =>
        val code = other match {
          case ExecResult.Error(_, c) => c
          case _                      => 200
        }
        val bytes = Responses.render(other).getBytes(UTF_8)
        x.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
        x.sendResponseHeaders(code, bytes.length)
        x.getResponseBody.write(bytes)
    }
  }

  private def sendJson(x: HttpExchange, code: Int, msg: String): Unit = {
    val bytes = (s"""{"status":$code,"message":${graft.store.EventStore.jsonString(msg)}}""" + "\n")
      .getBytes(UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length)
    x.getResponseBody.write(bytes)
  }

  private def plain(x: HttpExchange, code: Int, msg: String): Unit = {
    val bytes = msg.getBytes(UTF_8)
    x.getResponseHeaders.set("Content-Type", "text/plain")
    x.sendResponseHeaders(code, bytes.length)
    x.getResponseBody.write(bytes)
  }
}

object HttpFrontend {
  /** Request-body ceiling — the shared frontend command limit. */
  val MaxBodyBytes: Int = Frontends.MaxCommandBytes
}
