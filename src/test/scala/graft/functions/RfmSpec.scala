package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RfmSpec extends SparkSpec {
  import spark.implicits._

  test("rfm: threshold quintiles, exact monetary, segment string") {
    // 5 users with strictly increasing recency/frequency/monetary —
    // each lands in its own quintile, scores 1..5 aligned
    val ev = (1L to 5L).flatMap { u =>
      (1L to u).map(i => (u, u * 100L + i, "purchase", u.toDouble))
    }.toDF("user_id", "ts_us", "event_type", "value")
    val out = EventAnalytics.rfmSegments(ev, "user_id", col("ts_us"),
        col("value"), col("event_type") === "purchase")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    (1L to 5L).foreach { u =>
      assert(out(u) === ((u, u, u, s"$u-$u-$u")), s"user $u")
    }
  }

  test("rfm: non-purchase events count toward recency but not freq/monetary") {
    val ev = Seq(
      (1L, 100L, "purchase", 10.0), (1L, 900L, "view", 0.0),
      (2L, 200L, "purchase", 10.0)
    ).toDF("user_id", "ts_us", "event_type", "value")
    val out = EventAnalytics.rfmSegments(ev, "user_id", col("ts_us"),
        col("value"), col("event_type") === "purchase")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // user 1's view pushes recency above user 2's; freq/monetary tie
    assert(out(1L)._1 > out(2L)._1)
    assert(out(1L)._2 === out(2L)._2)
    assert(out(1L)._3 === out(2L)._3)
  }

  test("rfm: identical users share every score (ties share the bucket)") {
    val ev = Seq((1L, 100L, "purchase", 5.0), (2L, 100L, "purchase", 5.0))
      .toDF("user_id", "ts_us", "event_type", "value")
    val out = EventAnalytics.rfmSegments(ev, "user_id", col("ts_us"),
        col("value"), col("event_type") === "purchase")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out.size === 1)
  }

  test("rfm plan carries NO percentile aggregate — quintile thresholds " +
      "are bisected literals (the 100 TB plan is the plan)") {
    val ev = (1L to 40L).map(u => (u, u * 10L, "purchase", u * 2.0))
      .toDF("user_id", "ts_us", "event_type", "value")
    val df = EventAnalytics.rfmSegments(ev, "user_id", col("ts_us"),
      col("value"), col("event_type") === "purchase")
    val plan = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!plan.contains("percentile"),
      s"threshold percentile leaked back into the plan:\n$plan")
    assert(df.count() === 40L)
  }
}
