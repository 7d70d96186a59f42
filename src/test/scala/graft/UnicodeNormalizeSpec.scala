package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

class UnicodeNormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("NFC merges combining marks; NFKC folds compatibility forms") {
    graft.functions.UnicodeNormalize.register(spark)
    val df = Seq(("Café", "ﬁle")).toDF("a", "b") // é decomposed; ﬁ ligature
    val out = df.selectExpr(
      "unicode_normalize(a, 'NFC') as nfc",
      "length(unicode_normalize(a, 'NFC')) as n",
      "unicode_normalize(b, 'NFKC') as nfkc").as[(String, Int, String)].head()
    assert(out == (("Caf\u00e9", 4, "file")))
  }

  test("normalizeText canonicalizes case, marks and whitespace") {
    val df = Seq("  CAFÉ   du  Parc ").toDF("t")
    val out = df.select(TextAnalysis.normalizeText(col("t"))).as[String].head()
    assert(out == "caf\u00e9 du parc")
  }

  test("null rides through; unknown form fails analysis") {
    val df = Seq[Option[String]](None).toDF("t")
    assert(df.select(TextAnalysis.normalizeText(col("t"))).head().isNullAt(0))
    graft.functions.UnicodeNormalize.register(spark)
    intercept[Exception] {
      Seq("x").toDF("t").selectExpr("unicode_normalize(t, 'NFX')").collect()
    }
  }
}
