package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[GraftExtensions]] driven exactly as a user would on a stock cluster:
  * a SparkSession built with `spark.sql.extensions=graft.GraftExtensions`
  * runs `GRAFT <command>` statements through `spark.sql` and sees the
  * native functions without any per-session registration call.
  *
  * The extensions session shares the suite's SparkContext: extensions are
  * applied at SESSION build from the context's static conf, so the spec
  * sets the conf, clears the active/default session, builds, and restores
  * the shared session afterwards — the documented way to attach
  * extensions to an already-running context.
  */
class ExtensionsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def withExtensionsSession[T](f: SparkSession => T): T = {
    val base = SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      s.conf.set("spark.graft.data.dir", dir)
      SparkSession.setActiveSession(s)
      f(s)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("GRAFT statements run through spark.sql; plain SQL still parses") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    withExtensionsSession { s =>
      val viaSql = s.sql("GRAFT QUERY purchase WHERE value > 100")
      val viaApi = SparkEntry.run("QUERY purchase WHERE value > 100")(s, dir)
      assert(viaSql.count() == viaApi.count() && viaSql.count() > 0)
      assert(viaSql.columns.toSeq == viaApi.columns.toSeq)
      // aggregates and PLOT comparisons desugar identically
      val agg = s.sql("GRAFT QUERY purchase COUNT BY props")
      assert(agg.columns.toSet == Set("props", "count") && agg.count() > 0)
      // non-GRAFT statements delegate to the stock parser untouched
      assert(s.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
      // write-path commands are rejected with a pointer to the store API
      val e = intercept[Exception](s.sql("GRAFT FLUSH"))
      assert(e.getMessage.contains("EventStore"))
    }
  }

  test("native functions are session functions under the extension") {
    withExtensionsSession { s =>
      val r = s.sql("SELECT md5long('abc') AS h, dotl(array(1L, 2L), array(3L, 4L)) AS d")
        .head()
      assert(r.getLong(0) == graft.pipeline.Hashing.md5LongJvm("abc"))
      assert(r.getLong(1) == 11L)
      assert(s.sql("SELECT unicode_nfc('é') AS n").head().getString(0) == "é")
    }
  }

  test("without a data dir, session temp views serve as event types") {
    withExtensionsSession { s =>
      s.conf.unset("spark.graft.data.dir")
      import s.implicits._
      Seq(("u1", 100L, 250.0, "a"), ("u1", 200L, 50.0, "b"),
          ("u2", 150L, 300.0, "a"))
        .toDF("context_id", "timestamp", "value", "props")
        .createOrReplaceTempView("sale")
      val rows = s.sql("GRAFT QUERY sale WHERE value > 100")
        .collect().map(_.getAs[String]("context_id")).sorted.toSeq
      assert(rows == Seq("u1", "u2"))
      val agg = s.sql("GRAFT QUERY sale COUNT BY props").collect()
        .map(r => r.getAs[String]("props") -> r.getAs[Long]("count")).toMap
      assert(agg == Map("a" -> 2L, "b" -> 1L))
      // a view without the required identity column is a loud error
      Seq((1L, 2L)).toDF("x", "timestamp").createOrReplaceTempView("bad")
      val e = intercept[Exception](s.sql("GRAFT QUERY bad").collect())
      assert(e.getMessage.contains("context_id"))
      s.catalog.dropTempView("sale"); s.catalog.dropTempView("bad"); ()
    }
  }

  test("a live EventStore root binds as the GRAFT source") {
    withExtensionsSession { s =>
      val root = java.nio.file.Files.createTempDirectory("graft_ext_store_").toString
      val store = new graft.store.EventStore(s, root)
      store.execute("""DEFINE order FIELDS { amount: "int" }""")
      store.execute("""STORE order FOR u1 PAYLOAD {"amount": 5}""")
      store.execute("""STORE order FOR u2 PAYLOAD {"amount": 9}""")
      store.execute("FLUSH")
      // an unflushed memtable row must be visible too (store semantics)
      store.execute("""STORE order FOR u3 PAYLOAD {"amount": 11}""")
      s.conf.set("spark.graft.store.root", root)
      try {
        val rows = s.sql("GRAFT QUERY order WHERE amount > 6")
          .collect().map(_.getAs[String]("context_id")).sorted.toSeq
        assert(rows == Seq("u2", "u3"))
      } finally s.conf.unset("spark.graft.store.root")
    }
  }
}
