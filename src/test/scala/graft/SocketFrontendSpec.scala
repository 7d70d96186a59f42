package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.channels.{Channels, SocketChannel}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.auth.AuthManager
import graft.frontend.SocketFrontend
import graft.store.{EventStore, SecureEventStore}

/** TCP and Unix-socket wire integration: connection-level AUTH, pipelined
  * commands, blank-line response framing (reference `frontend/tcp`,
  * `frontend/unix`). */
class SocketFrontendSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def newEngine(): SecureEventStore = {
    val dir = Files.createTempDirectory("graft_sock_").toString
    val s = new SecureEventStore(new EventStore(spark, dir), new AuthManager(dir))
    assert(s.bootstrapAdmin("admin", "admin-key").isRight)
    s
  }

  /** Read one blank-line-terminated response. */
  private def readResponse(in: BufferedReader): String = {
    val sb = new StringBuilder
    var line = in.readLine()
    while (line != null && line.nonEmpty) { sb.append(line).append('\n'); line = in.readLine() }
    sb.toString
  }

  test("TCP: AUTH once, then bare commands run as the authed session") {
    val engine = newEngine()
    val fe = SocketFrontend.tcp(engine, port = 0)
    try {
      val sock = new Socket("127.0.0.1", fe.port)
      val out = new PrintWriter(sock.getOutputStream, true)
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))

      // unauthenticated command → 401
      out.println("PING")
      assert(readResponse(in).startsWith("401 "))

      out.println(s"AUTH admin:${AuthManager.hmacHex("admin-key", "admin")}")
      val authResp = readResponse(in)
      assert(authResp.contains("OK TOKEN "))

      // bare commands now carry the session implicitly
      out.println("""DEFINE t FIELDS { v: "int" }""")
      assert(readResponse(in).contains("Schema defined for 't'"))
      out.println("""STORE t FOR c1 PAYLOAD {"v": 7}""")
      assert(readResponse(in).contains("Event accepted"))
      out.println("FLUSH")
      assert(readResponse(in).startsWith("200 "))
      out.println("QUERY t WHERE v = 7")
      val q = readResponse(in)
      assert(q.contains(""""row_count":1""") && q.contains("\"type\":\"batch\""))

      // explicit credentials still pass through untouched
      val signed = """PING user_id=admin signature=""" + AuthManager.hmacHex("admin-key", "PING")
      out.println(signed)
      assert(readResponse(in).contains("PONG"))

      // a payload merely MENTIONING user_id= is not credentials — the session
      // token must still be appended (ADVICE r3: substring test misfired)
      out.println("""DEFINE u FIELDS { s: "string" }""")
      assert(readResponse(in).contains("Schema defined"))
      out.println("""STORE u FOR c1 PAYLOAD {"s": "mailto:user_id=alice"}""")
      assert(readResponse(in).contains("Event accepted"))
      sock.close()
    } finally fe.stop()
  }

  test("Unix socket: same protocol over a filesystem path") {
    val engine = newEngine()
    val path = Files.createTempDirectory("graft_uds_").resolve("graft.sock")
    val fe = SocketFrontend.unix(engine, path)
    try {
      val ch = SocketChannel.open(java.net.UnixDomainSocketAddress.of(path))
      val out = new PrintWriter(Channels.newOutputStream(ch), true)
      val in = new BufferedReader(new InputStreamReader(Channels.newInputStream(ch), UTF_8))
      out.println(s"AUTH admin:${AuthManager.hmacHex("admin-key", "admin")}")
      assert(readResponse(in).contains("OK TOKEN "))
      out.println("PING")
      assert(readResponse(in).contains("PONG"))
      ch.close()
    } finally fe.stop()
  }

  test("bounded line reader: lines, CRLF, EOF — protocol semantics intact") {
    import graft.frontend.SocketFrontend.readBoundedLine
    def rdr(s: String) = new java.io.BufferedReader(new java.io.StringReader(s))
    val r = rdr("PING\r\nFLUSH\nlast")
    assert(readBoundedLine(r) == "PING")
    assert(readBoundedLine(r) == "FLUSH")
    assert(readBoundedLine(r) == "last") // unterminated tail still delivered
    assert(readBoundedLine(r) == null)   // EOF
    assert(readBoundedLine(rdr("")) == null)
    assert(readBoundedLine(rdr("\n")) == "")
    // bare '\r' terminates a line exactly like BufferedReader.readLine
    val cr = rdr("PING\rFLUSH\r\nlast")
    assert(readBoundedLine(cr) == "PING")
    assert(readBoundedLine(cr) == "FLUSH")
    assert(readBoundedLine(cr) == "last")
  }
}
