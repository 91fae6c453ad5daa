package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Luhn mod-10 screen ([[TextFunctions.luhnSum]]/`luhnValid`/
  * `luhnCheckDigit`): known card-number vectors, the check-digit
  * construction round-trip, and single-digit tamper sensitivity. */
class LuhnSpec extends SparkSpec {
  import spark.implicits._

  private def valid(ds: Seq[String]): Seq[Boolean] =
    ds.toDF("d").select(TextFunctions.luhnValid(col("d")))
      .as[Boolean].collect().toSeq

  test("known vectors: classic test numbers pass, off-by-one fails") {
    // 4111111111111111 / 79927398713 are the canonical Luhn examples;
    // 4111111111111112 flips only the check digit
    assert(valid(Seq("4111111111111111", "79927398713",
      "4111111111111112", "79927398710")) ===
      Seq(true, true, false, false))
  }

  test("check-digit construction round-trips for every base") {
    val bases = (0 until 50).map(i =>
      (i.toLong, f"${math.abs(i * 987654321987L % 1000000000000000L)}%015d"))
    val got = bases.toDF("i", "base")
      .select(col("i"),
        TextFunctions.luhnValid(concat(col("base"),
          TextFunctions.luhnCheckDigit(col("base")).cast("string")))
          .as("ok"),
        TextFunctions.luhnValid(concat(col("base"),
          ((TextFunctions.luhnCheckDigit(col("base")) + 1) % 10)
            .cast("string"))).as("tampered"))
      .as[(Long, Boolean, Boolean)].collect()
    assert(got.forall(_._2), "construction must always validate")
    assert(got.forall(!_._3), "check+1 must always fail")
  }

  test("any single-digit substitution breaks a valid number") {
    // Luhn detects ALL single-digit substitutions by design
    val base = "411111111111111" // + check digit 1 -> valid
    val mutants = for {
      pos <- 0 until 16
      d <- '0' to '9'
      s = "4111111111111111".updated(pos, d)
      if s != "4111111111111111"
    } yield s
    assert(valid(mutants).forall(_ == false))
    assert(base.length === 15)
  }
}
