package graft.frontend

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, Writer}
import java.net.{InetSocketAddress, StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.channels.{Channels, ServerSocketChannel, SocketChannel}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import graft.store.{Responses, SecureEventStore}

/** TCP / Unix-domain-socket frontends (reference `src/frontend/tcp/
  * listener.rs`, `src/frontend/unix/`; SURVEY.md §2 S9): newline-delimited
  * commands in, line-protocol responses out, one thread per connection.
  *
  * Connection auth state (reference `TcpAuthState`): an `AUTH user:sig`
  * line authenticates the CONNECTION — the issued session token is
  * remembered and appended to subsequent bare commands, so clients
  * authenticate once and then send plain commands at full throughput.
  * Commands carrying their own credential/`TOKEN` suffix pass through
  * untouched.
  *
  * Framing: each response ([[Responses.render]] — a `<code> <message>`
  * header then body lines / JSON frames) is terminated by one empty line,
  * so pipelined clients can split the stream without knowing frame counts.
  */
final class SocketFrontend private (engine: SecureEventStore,
    server: ServerSocketChannel) {

  private val pool = Executors.newCachedThreadPool()
  private val running = new AtomicBoolean(true)
  private val acceptor = new Thread(() => acceptLoop(), "graft-socket-accept")

  def start(): this.type = { acceptor.setDaemon(true); acceptor.start(); this }

  def stop(): Unit = {
    running.set(false)
    server.close()
    pool.shutdownNow()
  }

  /** Bound TCP port (TCP mode only). */
  def port: Int = server.getLocalAddress match {
    case a: InetSocketAddress => a.getPort
    case _                    => -1
  }

  private def acceptLoop(): Unit =
    try {
      while (running.get()) {
        val ch = server.accept()
        pool.execute(() => serve(ch))
      }
    } catch { case _: Exception => () /* closed on stop */ }

  private def serve(ch: SocketChannel): Unit = {
    val in = new BufferedReader(new InputStreamReader(Channels.newInputStream(ch), UTF_8))
    val out: Writer = new OutputStreamWriter(Channels.newOutputStream(ch), UTF_8)
    var sessionToken: Option[String] = None
    try {
      var line = SocketFrontend.readBoundedLine(in)
      while (line != null) {
        val t = line.trim
        if (t.nonEmpty) {
          val hasCreds = graft.store.SecureEventStore.hasCredentialSuffix(t)
          val isAuth = t.length >= 5 && t.substring(0, 5).equalsIgnoreCase("AUTH ")
          val cmd =
            if (isAuth || hasCreds || sessionToken.isEmpty) t
            else s"$t TOKEN ${sessionToken.get}" // connection-level auth
          val result = engine.execute(cmd)
          if (isAuth) result match {
            case graft.store.ExecResult.Ok(msg) if msg.startsWith("OK TOKEN ") =>
              sessionToken = Some(msg.stripPrefix("OK TOKEN ").trim)
            case _ => ()
          }
          out.write(Responses.render(result))
          out.write("\n") // response terminator
          out.flush()
        }
        line = SocketFrontend.readBoundedLine(in)
      }
    } catch { case _: Exception => () } finally ch.close()
  }
}

object SocketFrontend {

  /** Per-command line ceiling in CHARS: half [[Frontends.MaxCommandBytes]],
    * so the UTF-16 StringBuilder heap footprint (2 bytes/char) honors the
    * same 64 MiB ceiling the byte-counting frontends enforce. */
  val MaxLineChars: Int = Frontends.MaxCommandBytes / 2

  /** `readLine` with a length bound: an unbounded line lets one client
    * stream gigabytes into the server heap before the first newline. Past
    * the cap the connection is failed (IOException → close), matching the
    * WS frontend's oversized-frame behavior. Null at end of stream;
    * terminates on '\n', '\r', or "\r\n" exactly like
    * BufferedReader.readLine. */
  private[graft] def readBoundedLine(in: BufferedReader): String = {
    val sb = new StringBuilder
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n' && c != '\r') {
      sb.append(c.toChar)
      if (sb.length > MaxLineChars)
        throw new java.io.IOException(s"command line exceeds $MaxLineChars chars")
      c = in.read()
    }
    if (c == '\r') { // consume a following '\n' (CRLF), keep anything else
      in.mark(1)
      if (in.read() != '\n') in.reset()
    }
    sb.toString
  }

  /** TCP listener on 127.0.0.1 (reference default port 7171; pass 0 for an
    * ephemeral test port). */
  def tcp(engine: SecureEventStore, port: Int = 7171): SocketFrontend = {
    val server = ServerSocketChannel.open()
    server.bind(new InetSocketAddress("127.0.0.1", port))
    new SocketFrontend(engine, server).start()
  }

  /** Unix-domain-socket listener at `path` (reference `frontend/unix`). */
  def unix(engine: SecureEventStore, path: java.nio.file.Path): SocketFrontend = {
    java.nio.file.Files.deleteIfExists(path)
    val server = ServerSocketChannel.open(StandardProtocolFamily.UNIX)
    server.bind(UnixDomainSocketAddress.of(path))
    new SocketFrontend(engine, server).start()
  }
}
