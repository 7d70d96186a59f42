package graft.frontend

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import graft.store.{Responses, SecureEventStore}

/** WebSocket frontend (reference `src/frontend/ws/listener.rs`; SURVEY.md
  * §2 S9): RFC 6455 over a plain socket — HTTP Upgrade handshake, masked
  * client text frames carrying line-protocol commands, unmasked server text
  * frames carrying [[Responses.render]] output. Connection-level `AUTH`
  * issues a session token that rides along on subsequent bare commands,
  * mirroring the reference's WS auth state; ping frames are ponged; close
  * is echoed.
  *
  * Hand-rolled framing (no extra dependencies): single-frame text messages
  * (FIN=1) with 7/16/64-bit lengths — the command sizes this protocol
  * carries.
  */
final class WsFrontend(engine: SecureEventStore, port: Int = 0) {

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", port))
  private val pool = Executors.newCachedThreadPool()
  private val running = new AtomicBoolean(true)
  private val acceptor = new Thread(() => acceptLoop(), "graft-ws-accept")

  def start(): Int = { acceptor.setDaemon(true); acceptor.start(); server.getLocalPort }
  def stop(): Unit = { running.set(false); server.close(); pool.shutdownNow() }

  private def acceptLoop(): Unit =
    try {
      while (running.get()) {
        val sock = server.accept()
        pool.execute(() => serve(sock))
      }
    } catch { case _: Exception => () }

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      if (!handshake(in, out)) return
      var sessionToken: Option[String] = None
      var open = true
      while (open) {
        WsFrontend.readFrame(in) match {
          case None => open = false
          case Some((WsFrontend.OpClose, _)) =>
            WsFrontend.writeFrame(out, WsFrontend.OpClose, Array.emptyByteArray)
            open = false
          case Some((WsFrontend.OpPing, payload)) =>
            WsFrontend.writeFrame(out, WsFrontend.OpPong, payload)
          case Some((WsFrontend.OpText, payload)) =>
            val t = new String(payload, UTF_8).trim
            if (t.nonEmpty) {
              val hasCreds = graft.store.SecureEventStore.hasCredentialSuffix(t)
              val isAuth = t.length >= 5 && t.substring(0, 5).equalsIgnoreCase("AUTH ")
              val cmd =
                if (isAuth || hasCreds || sessionToken.isEmpty) t
                else s"$t TOKEN ${sessionToken.get}"
              val result = engine.execute(cmd)
              if (isAuth) result match {
                case graft.store.ExecResult.Ok(msg) if msg.startsWith("OK TOKEN ") =>
                  sessionToken = Some(msg.stripPrefix("OK TOKEN ").trim)
                case _ => ()
              }
              WsFrontend.writeFrame(out, WsFrontend.OpText,
                Responses.render(result).getBytes(UTF_8))
            }
          case Some(_) => () // ignore pong/binary/continuation
        }
      }
    } catch { case _: Exception => () } finally sock.close()
  }

  /** HTTP Upgrade handshake (RFC 6455 §4). */
  private def handshake(in: DataInputStream, out: DataOutputStream): Boolean = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var prev = 0
    var total = 0
    var b = in.read()
    while (b >= 0) {
      total += 1
      // header ceiling: endless header bytes must not grow the heap
      // unbounded (64 KiB is far beyond any legitimate upgrade request)
      if (total > WsFrontend.MaxHandshakeBytes) {
        out.write("HTTP/1.1 431 Request Header Fields Too Large\r\n\r\n".getBytes(UTF_8))
        out.flush()
        return false
      }
      if (b == '\n') {
        val line = sb.toString.stripSuffix("\r")
        if (line.isEmpty) { b = -1 } else { lines += line; sb.clear(); b = in.read() }
      } else { sb.append(b.toChar); prev = b; b = in.read() }
    }
    val key = lines.collectFirst {
      case l if l.toLowerCase.startsWith("sec-websocket-key:") => l.split(":", 2)(1).trim
    }
    key match {
      case None =>
        out.write("HTTP/1.1 400 Bad Request\r\n\r\n".getBytes(UTF_8)); out.flush(); false
      case Some(k) =>
        val accept = Base64.getEncoder.encodeToString(
          MessageDigest.getInstance("SHA-1")
            .digest((k + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
        out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
          s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
        out.flush(); true
    }
  }
}

object WsFrontend {
  val OpText = 0x1; val OpClose = 0x8; val OpPing = 0x9; val OpPong = 0xa

  /** Upgrade-request header ceiling (see handshake). */
  val MaxHandshakeBytes: Int = 64 * 1024

  /** Read one frame → (opcode, payload); None on EOF. Unmasks when masked. */
  def readFrame(in: DataInputStream): Option[(Int, Array[Byte])] = {
    val b0 = in.read(); if (b0 < 0) return None
    val opcode = b0 & 0x0f
    val b1 = in.read(); if (b1 < 0) return None
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) len = in.readUnsignedShort().toLong
    else if (len == 127) len = in.readLong()
    if (len < 0 || len > Frontends.MaxCommandBytes.toLong) // shared command ceiling
      throw new java.io.IOException(s"frame too large: $len")
    val mask = if (masked) { val m = new Array[Byte](4); in.readFully(m); m } else null
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    if (masked) {
      var i = 0
      while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
    }
    Some((opcode, payload))
  }

  /** Write one unmasked server frame (use `maskKey` for client frames). */
  def writeFrame(out: DataOutputStream, opcode: Int, payload: Array[Byte],
      maskKey: Option[Array[Byte]] = None): Unit = {
    out.write(0x80 | opcode) // FIN + opcode
    val maskBit = if (maskKey.isDefined) 0x80 else 0x00
    if (payload.length < 126) out.write(maskBit | payload.length)
    else if (payload.length < 65536) { out.write(maskBit | 126); out.writeShort(payload.length) }
    else { out.write(maskBit | 127); out.writeLong(payload.length.toLong) }
    maskKey match {
      case Some(m) =>
        out.write(m)
        val masked = new Array[Byte](payload.length)
        var i = 0
        while (i < payload.length) { masked(i) = (payload(i) ^ m(i % 4)).toByte; i += 1 }
        out.write(masked)
      case None => out.write(payload)
    }
    out.flush()
  }
}
