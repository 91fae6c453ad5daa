package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Dedup

/** graft_md5long must be value-identical to the composed built-in form
  * ((('0x'||hex[1..7])::LONG << 32) | hex[9..16]::LONG) on arbitrary
  * strings, including empty, unicode, and long inputs. */
class Md5LongExprSpec extends SparkSpec {
  import spark.implicits._

  test("native graft_md5long is value-identical to the composed form") {
    val rnd = new scala.util.Random(7)
    val strs = Seq("", "a", "hello world", "中文分词", "Ünïcødé",
      "sepjoined", "0", "-1", "9223372036854775807") ++
      (1 to 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(60)).mkString) ++
      (1 to 50).map(_ => rnd.nextLong().toString)
    val df = strs.toDF("s")
    val r = df.select(
      call_function("graft_md5long", col("s")).as("nat"),
      Dedup.Md5Hasher.md5LongComposed(col("s")).as("hof")).collect()
    r.foreach(row => assert(row.getLong(0) === row.getLong(1)))
    // always non-negative (60-bit)
    r.foreach(row => assert(row.getLong(0) >= 0L))
  }

  test("null in, null out") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(call_function("graft_md5long", col("s"))).collect()
    assert(r(0).isNullAt(0))
  }
}
