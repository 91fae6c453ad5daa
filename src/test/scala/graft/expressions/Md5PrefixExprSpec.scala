package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** graft_md5prefix(s, n) must be value-identical to the composed
  * built-in form `conv(substring(md5(s), 1, n), 16, 10)::LONG` for every
  * n in [1, 15] on arbitrary strings — the pin that lets
  * Sampling.stableBucket / Dsir.featureBucket / the noise streams ride
  * the native kernel while their SQL oracles keep the substring form. */
class Md5PrefixExprSpec extends SparkSpec {
  import spark.implicits._

  test("native graft_md5prefix is value-identical to the composed form") {
    val rnd = new scala.util.Random(11)
    val strs = Seq("", "a", "hello world", "中文分词", "Ünïcødé",
      "gumbel:42", "0", "-1", "9223372036854775807") ++
      (1 to 300).map(_ => rnd.alphanumeric.take(rnd.nextInt(60)).mkString) ++
      (1 to 50).map(_ => rnd.nextLong().toString)
    val df = strs.toDF("s")
    Seq(1, 4, 8, 12, 13, 15).foreach { n =>
      val r = df.select(
        call_function("graft_md5prefix", col("s"), lit(n)).as("nat"),
        conv(substring(md5(col("s")), 1, n), 16, 10).cast("long").as("hof"))
        .collect()
      r.foreach { row =>
        assert(row.getLong(0) === row.getLong(1), s"hexChars=$n")
        assert(row.getLong(0) >= 0L)
      }
    }
  }

  test("null in, null out") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(call_function("graft_md5prefix", col("s"), lit(8))).collect()
    assert(r(0).isNullAt(0))
  }

  test("hexChars outside [1, 15] is rejected at analysis") {
    val df = Seq("x").toDF("s")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_md5prefix", col("s"), lit(16))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_md5prefix", col("s"), lit(0))).collect()
    }
  }
}
