package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ISO 13616 mod-97 IBAN screen ([[TextFunctions.ibanMod97]]/
  * `ibanValid`): published example IBANs across countries (including a
  * letter in the BBAN body), tamper sensitivity, and the remainder's
  * range. */
class IbanSpec extends SparkSpec {
  import spark.implicits._

  private def valid(ds: Seq[String]): Seq[Boolean] =
    ds.toDF("d").select(TextFunctions.ibanValid(col("d")))
      .as[Boolean].collect().toSeq

  test("published examples validate; check-digit tampers fail") {
    assert(valid(Seq(
      "GB82WEST12345698765432",          // the ISO registry example
      "DE89370400440532013000",          // all-digit BBAN
      "FR1420041010050500013M02606",     // letter inside the BBAN
      "GB82WEST12345698765433",          // last digit +1
      "GB83WEST12345698765432",          // check digits tampered
      "DE89370400440532013001")) ===
      Seq(true, true, true, false, false, false))
  }

  test("any single-digit substitution in the BBAN breaks validity — the " +
      "mod-97 guarantee") {
    val base = "DE89370400440532013000"
    val mutants = for {
      pos <- 4 until base.length
      d <- '0' to '9'
      s = base.updated(pos, d)
      if s != base
    } yield s
    assert(valid(mutants).forall(_ == false))
  }

  test("remainder is a genuine mod: always in [0, 97) over random " +
      "well-formed candidates") {
    val cands = (0 until 60).map { i =>
      f"XY${i % 100}%02dTEST${math.abs(i * 987654321L % 10000000000L)}%010d"
    }
    val rems = cands.toDF("d")
      .select(TextFunctions.ibanMod97(col("d"))).as[Int].collect()
    assert(rems.forall(r => r >= 0 && r < 97))
  }
}
