package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** graft_normalize (UAX #15 Unicode normalization): all four forms,
  * null propagation, analysis-time rejection of bad forms, and the
  * dedup-motivating property (variants hash identically after NFC). */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String, form: String): String =
    Seq(s).toDF("t")
      .select(TextFunctions.normalizeUnicode(col("t"), form))
      .as[String].head()

  test("NFC composes combining sequences; NFD decomposes them back") {
    assert(norm("café", "NFC") === "café")
    assert(norm("café", "NFD") === "café")
    assert(norm("Å", "NFC") === "Å")
  }

  test("NFKC folds compatibility forms: ligatures, fullwidth, " +
      "superscripts — NFC leaves them alone") {
    assert(norm("ﬁle", "NFKC") === "file")     // ﬁ ligature
    assert(norm("ﬁle", "NFC") === "ﬁle")
    assert(norm("ＡＢ", "NFKC") === "AB")   // fullwidth A B
    assert(norm("x²", "NFKC") === "x2")        // superscript 2
    assert(norm("①", "NFKC") === "1")          // circled digit one
  }

  test("nulls propagate; empty string is a fixed point") {
    val out = Seq(Some("é"), None).toDF("t")
      .select(TextFunctions.normalizeUnicode(col("t")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(Some("é"), None))
    assert(norm("", "NFC") === "")
  }

  test("bad form is an analysis error, not a runtime crash") {
    val ex = intercept[AnalysisException] {
      Seq("x").toDF("t")
        .select(TextFunctions.normalizeUnicode(col("t"), "NFX")).collect()
    }
    assert(ex.getMessage.contains("NFC/NFD/NFKC/NFKD"))
  }

  test("the dedup motivation: md5 fingerprints of composed and " +
      "decomposed variants collide only AFTER normalization") {
    val df = Seq(("café menu", "café menu")).toDF("a", "b")
    val row = df.select(
      (md5(col("a")) === md5(col("b"))).as("raw_same"),
      (md5(TextFunctions.normalizeUnicode(col("a"))) ===
        md5(TextFunctions.normalizeUnicode(col("b")))).as("nfc_same"))
      .head()
    assert(!row.getBoolean(0) && row.getBoolean(1))
  }
}
