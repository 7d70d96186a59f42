package graft

import java.io.{BufferedReader, DataInputStream, DataOutputStream, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.auth.AuthManager
import graft.frontend.WsFrontend
import graft.store.{EventStore, SecureEventStore}

/** RFC 6455 WebSocket integration: handshake, masked client frames,
  * connection AUTH, command round-trips, ping/pong (reference
  * `frontend/ws/listener.rs`). */
class WsFrontendSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def newEngine(): SecureEventStore = {
    val dir = Files.createTempDirectory("graft_ws_").toString
    val s = new SecureEventStore(new EventStore(spark, dir), new AuthManager(dir))
    assert(s.bootstrapAdmin("admin", "admin-key").isRight)
    s
  }

  /** Minimal WS client: handshake + masked frames via WsFrontend's codec. */
  private final class Client(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    private val out = new DataOutputStream(sock.getOutputStream)
    private val in = new DataInputStream(sock.getInputStream)

    def handshake(): String = {
      out.write(("GET /ws HTTP/1.1\r\nHost: 127.0.0.1\r\nUpgrade: websocket\r\n" +
        "Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(UTF_8))
      out.flush()
      val r = new BufferedReader(new InputStreamReader(in, UTF_8))
      var line = r.readLine(); val first = line
      while (line != null && line.nonEmpty) line = r.readLine()
      first
      // NOTE: BufferedReader buffering is safe here only because the server
      // sends nothing after the handshake until we write a frame
    }

    def send(text: String): Unit =
      WsFrontend.writeFrame(out, WsFrontend.OpText, text.getBytes(UTF_8),
        maskKey = Some(Array(1, 2, 3, 4).map(_.toByte)))
    def ping(): Unit =
      WsFrontend.writeFrame(out, WsFrontend.OpPing, "hi".getBytes(UTF_8),
        maskKey = Some(Array(9, 8, 7, 6).map(_.toByte)))
    def recv(): (Int, String) = {
      val (op, payload) = WsFrontend.readFrame(in).getOrElse(fail("connection closed"))
      (op, new String(payload, UTF_8))
    }
    def close(): Unit = sock.close()
  }

  test("WS handshake, AUTH session, commands and ping round-trip") {
    val engine = newEngine()
    val fe = new WsFrontend(engine)
    val port = fe.start()
    try {
      val c = new Client(port)
      val status = c.handshake()
      assert(status == "HTTP/1.1 101 Switching Protocols")

      c.send("PING")
      assert(c.recv()._2.startsWith("401 ")) // unauthenticated

      c.send(s"AUTH admin:${AuthManager.hmacHex("admin-key", "admin")}")
      assert(c.recv()._2.contains("OK TOKEN "))

      c.send("""DEFINE w FIELDS { v: "int" }""")
      assert(c.recv()._2.contains("Schema defined for 'w'"))
      c.send("""STORE w FOR c1 PAYLOAD {"v": 3}""")
      assert(c.recv()._2.contains("Event accepted"))
      c.send("QUERY w")
      val q = c.recv()._2
      assert(q.contains(""""row_count":1""") && q.contains("\"type\":\"batch\""))

      c.ping()
      val (op, pong) = c.recv()
      assert(op == WsFrontend.OpPong && pong == "hi")
      c.close()
    } finally fe.stop()
  }
}
