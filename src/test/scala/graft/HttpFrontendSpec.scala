package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.auth.AuthManager
import graft.frontend.HttpFrontend
import graft.store.{EventStore, SecureEventStore}

/** Real-HTTP integration: DEFINE/STORE/QUERY over POST /command and
  * /json-command with header auth, a 403, a streamed frame body and the
  * Arrow output mode (reference `src/frontend/http/`). */
class HttpFrontendSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String,
      headers: Seq[(String, String)] = Nil): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def signed(user: String, key: String, body: String): Seq[(String, String)] =
    Seq("X-Auth-User" -> user, "X-Auth-Signature" -> AuthManager.hmacHex(key, body.trim))

  private def newServer(arrow: Boolean = false): (HttpFrontend, Int, SecureEventStore) = {
    val dir = Files.createTempDirectory("graft_http_").toString
    val s = new SecureEventStore(new EventStore(spark, dir), new AuthManager(dir))
    assert(s.bootstrapAdmin("admin", "admin-key").isRight)
    val fe = new HttpFrontend(s, outputFormat = if (arrow) "arrow" else "unix")
    val port = fe.start()
    (fe, port, s)
  }

  test("full flow over HTTP: define, store, query with streamed frames; 401/403/404/405") {
    val (fe, port, s) = newServer()
    try {
      // unauthenticated → 401
      assert(post(port, "/command", "PING").statusCode() == 401)

      def admin(body: String) = post(port, "/command", body, signed("admin", "admin-key", body))

      val r1 = admin("""DEFINE orders FIELDS { amount: "int" }""")
      assert(r1.statusCode() == 200 && r1.body().contains("Schema defined for 'orders'"))
      assert(r1.headers().firstValue("X-Execution-Time-Ms").isPresent)
      assert(admin("""STORE orders FOR c1 PAYLOAD {"amount": 5}""").statusCode() == 200)
      assert(admin("""STORE orders FOR c2 PAYLOAD {"amount": 9}""").statusCode() == 200)
      assert(admin("FLUSH").statusCode() == 200)

      // streamed frame body: schema + batch + end JSON line frames
      val q = admin("QUERY orders WHERE amount > 3")
      assert(q.statusCode() == 200)
      val lines = q.body().linesIterator.toSeq
      assert(lines.head == "200 OK")
      assert(lines.exists(_.contains(""""type":"schema"""")))
      assert(lines.exists(_.contains(""""type":"batch"""")))
      assert(lines.last.contains(""""row_count":2"""))

      // non-admin without grants → 403 on the wire
      assert(admin("""CREATE USER bob WITH KEY "bob-key"""").statusCode() == 200)
      val denied = post(port, "/command", "QUERY orders",
        signed("bob", "bob-key", "QUERY orders"))
      assert(denied.statusCode() == 403)
      assert(denied.body().startsWith("403 Read permission denied"))

      // protected contexts are wire-restricted
      val sys = admin("""STORE orders FOR __system_x PAYLOAD {"amount": 1}""")
      assert(sys.statusCode() == 403 && sys.body().contains("System contexts are restricted"))

      // routing
      assert(post(port, "/nope", "x").statusCode() == 404)
      val get = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/command")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 405)

      // session-token auth over the wire
      val tok = {
        val auth = s"AUTH admin:${AuthManager.hmacHex("admin-key", "admin")}"
        val resp = post(port, "/command", auth)
        assert(resp.statusCode() == 200)
        resp.body().linesIterator.toSeq(1).stripPrefix("OK TOKEN ").trim
      }
      assert(post(port, "/command", s"PING TOKEN $tok").statusCode() == 200)
    } finally fe.stop()
  }

  test("/json-command: tagged commands with where-expression, header auth required") {
    val (fe, port, _) = newServer()
    try {
      def admin(body: String) = post(port, "/json-command", body, signed("admin", "admin-key", body))

      // missing headers → 401 with the reference's message
      val noAuth = post(port, "/json-command", """{"type":"Ping"}""")
      assert(noAuth.statusCode() == 401 && noAuth.body().contains("missing X-Auth-User"))

      assert(admin("""{"type":"Define","event_type":"ev","schema":{"fields":{"v":"int","plan":["a","b"]}}}""").statusCode() == 200)
      assert(admin("""{"type":"Store","event_type":"ev","context_id":"c1","payload":{"v":3,"plan":"a"}}""").statusCode() == 200)
      assert(admin("""{"type":"Store","event_type":"ev","context_id":"c2","payload":{"v":8,"plan":"b"}}""").statusCode() == 200)
      assert(admin("""{"type":"Flush"}""").statusCode() == 200)

      val q = admin("""{"type":"Query","event_type":"ev","where_clause":{"and":[{"field":"v","op":"gt","value":1},{"field":"plan","op":"eq","value":"b"}]}}""")
      assert(q.statusCode() == 200)
      assert(q.body().contains(""""row_count":1"""))

      val rep = admin("""{"type":"Replay","context_id":"c1"}""")
      assert(rep.statusCode() == 200 && rep.body().contains(""""row_count":1"""))

      val bad = admin("""{"type":"Wibble"}""")
      assert(bad.statusCode() == 400 && bad.body().contains("unknown command type"))

      // batch form
      val b = admin("""{"type":"Batch","commands":[{"type":"Ping"},{"type":"Flush"}]}""")
      assert(b.statusCode() == 200)
    } finally fe.stop()
  }

  test("JsonCommands rendering round-trips escapes and rejects malformed identifiers") {
    import graft.frontend.JsonCommands
    // a quote + trailing backslash in string operands must escape, not
    // truncate the rendered command (ADVICE r3 low)
    val q = JsonCommands.toCommandText(
      """{"type":"Query","event_type":"t","since":"2024-01-01T00:00:00Z",""" +
        """"where":{"field":"s","op":"eq","value":"he said \"hi\" \\"}}""")
    assert(q.isRight)
    graft.parser.CommandParser.parse(q.toOption.get) match {
      case qc: graft.ast.QueryCmd =>
        assert(qc.since.contains(1704067200L)) // 2024-01-01T00:00:00Z
        qc.where match {
          case Some(graft.ast.Expr.Cmp(_, _, graft.ast.Lit.Str(v))) =>
            assert(v == "he said \"hi\" \\")
          case other => fail(s"unexpected where: $other")
        }
      case other => fail(s"unexpected command: $other")
    }
    // identifier-position values with whitespace/structural chars are
    // rejected, not spliced into a different command
    assert(JsonCommands.toCommandText(
      """{"type":"Store","event_type":"t x","context_id":"c","payload":{}}""").isLeft)
    assert(JsonCommands.toCommandText(
      """{"type":"Query","event_type":"t","context_id":"c d"}""").isLeft)
    assert(JsonCommands.toCommandText(
      """{"type":"Define","event_type":"e","schema":{"fields":{"f":["a b","c"]}}}""").isLeft)
  }

  test("arrow output mode: frames as Arrow IPC streams, errors as JSON") {
    val (fe, port, _) = newServer(arrow = true)
    try {
      def adminRaw(body: String): HttpResponse[Array[Byte]] = {
        val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/command"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
        signed("admin", "admin-key", body).foreach { case (k, v) => b.header(k, v) }
        client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
      }
      assert(adminRaw("""DEFINE t FIELDS { v: "int" }""").statusCode() == 200)
      assert(adminRaw("""STORE t FOR c PAYLOAD {"v": 7}""").statusCode() == 200)
      assert(adminRaw("FLUSH").statusCode() == 200)
      val q = adminRaw("QUERY t")
      assert(q.statusCode() == 200)
      assert(q.headers().firstValue("Content-Type").get() == "application/vnd.apache.arrow.stream")
      // decode the Arrow stream and find the stored value
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(q.body()), alloc)
      var vSeen = -1L
      while (reader.loadNextBatch()) {
        val root = reader.getVectorSchemaRoot
        val idx = root.getSchema.getFields.asScalaNames.indexOf("v")
        val vec = root.getVector("v").asInstanceOf[org.apache.arrow.vector.BigIntVector]
        if (root.getRowCount > 0) vSeen = vec.get(0)
        assert(idx >= 0)
      }
      reader.close(); alloc.close()
      assert(vSeen == 7L)

      // errors stay JSON (reference dispatcher.rs:415-428)
      val err = adminRaw("""STORE undefined_type FOR c PAYLOAD {"v": 1}""")
      assert(err.statusCode() == 400)
      assert(err.headers().firstValue("Content-Type").get() == "application/json")
      assert(new String(err.body(), "UTF-8").contains("\"status\":400"))
    } finally fe.stop()
  }

  private implicit class FieldsOps(fs: java.util.List[org.apache.arrow.vector.types.pojo.Field]) {
    def asScalaNames: Seq[String] = {
      import scala.jdk.CollectionConverters._
      fs.asScala.map(_.getName).toSeq
    }
  }
}
