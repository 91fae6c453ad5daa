package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Funnel / retention / resample on hand-built event sets with known
  * answers, plus the strictness and gap-fill edge cases. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // one hour in µs

  private def funnelOf(rows: (Long, Long, String)*) = {
    val df = rows.toDF("user_id", "ts_us", "etype")
    EventAnalytics.funnel(df, "user_id", col("ts_us"),
      col("etype") === "a", col("etype") === "b", col("etype") === "c")
  }

  test("funnel demands strict temporal order per stage") {
    val got = funnelOf(
      // u1 completes a(10) -> b(20) -> c(30)
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // u2's b precedes its a: stage stops at 1
      (2L, 50L, "b"), (2L, 60L, "a"),
      // u3's c precedes its b: stage stops at 2; later b has no c after
      (3L, 10L, "a"), (3L, 15L, "c"), (3L, 20L, "b"),
      // u4 never does a: stage 0
      (4L, 99L, "b"), (4L, 100L, "c"))
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("funnel picks the FIRST qualifying event of each stage") {
    val got = funnelOf(
      (1L, 10L, "a"), (1L, 5L, "a"),          // first a = 5
      (1L, 7L, "b"), (1L, 12L, "b"),          // first b after 5 = 7
      (1L, 6L, "c"), (1L, 40L, "c"))          // first c after 7 = 40
      .select("s1_us", "s2_us", "s3_us").as[(Long, Long, Long)]
      .collect().toList
    assert(got === List((5L, 7L, 40L)))
  }

  test("funnel equal timestamps do NOT satisfy the strict order") {
    val got = funnelOf((1L, 10L, "a"), (1L, 10L, "b"))
      .select("stage").as[Long].collect().toList
    assert(got === List(1L))
  }

  test("retention counts distinct users per cohort-offset cell") {
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, day + 1), (1L, 2 * day + 5), // cohort 0: offsets 0,1,2
      (2L, 1L), (2L, 2 * day + 7),                // cohort 0: offsets 0,2
      (3L, day), (3L, day + 42)                   // cohort day: offset 0 ×2
    ).toDF("user_id", "ts_us")
    val got = EventAnalytics.retention(ev, "user_id", col("ts_us"), day)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 2L),
      (day, 0L, 1L)))
  }

  test("resample zero-fills gaps and forward-fills the observed mean") {
    val ev = Seq(
      (1L, 0L, 2.0), (1L, 10L, 4.0), // hour 0: n=2 sum=6 avg=3
      (1L, 3 * H + 1, 9.0)           // hour 3: n=1 sum=9; hours 1,2 gap
    ).toDF("user_id", "ts_us", "value")
    val got = EventAnalytics.resampleHourly(ev, "user_id", col("ts_us"),
        col("value"))
      .select(col("hour_us"), col("n_events"),
        col("sum_value").cast("double"), col("ffill_avg"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toList
    assert(got === List(
      (0L, 2L, 6.0, 3.0),
      (H, 0L, 0.0, 3.0),       // gap: zero-filled, mean carried
      (2 * H, 0L, 0.0, 3.0),
      (3 * H, 1L, 9.0, 9.0)))  // new observation resets the carry
  }

  test("spikeFlags: planted spike flags, steady series never does, " +
      "and thin history is exempt") {
    // series A: 10 steady hours of 5 events, then an hour of 50
    val steady = (0 until 10).flatMap(h =>
      Seq.fill(5)(("A", h.toLong * H + 1)))
    val spike = Seq.fill(50)(("A", 10L * H + 1))
    // series B: alternating 4/6 — variance absorbs everything
    val noisy = (0 until 11).flatMap(h =>
      Seq.fill(if (h % 2 == 0) 4 else 6)(("B", h.toLong * H + 1)))
    val ev = (steady ++ spike ++ noisy).toDF("series", "ts_us")
    val got = EventAnalytics.spikeFlags(ev, "series", col("ts_us"),
        bucketUs = H, lookback = 24, z = 3, minBase = 5)
      .select("series", "bucket_us", "is_spike")
      .as[(String, Long, Long)].collect()
    val spikes = got.filter(_._3 === 1L).map(r => (r._1, r._2)).toSet
    assert(spikes === Set(("A", 10L * H)))
    // thin history: the first minBase buckets of A never flag
    assert(got.filter(r => r._1 == "A" && r._2 < 5 * H).forall(_._3 === 0L))
  }

  test("spikeFlags is deterministic across partitionings") {
    val ev = (0 until 200).map(i =>
      (s"s${i % 3}", (i / 7).toLong * H + i)).toDF("series", "ts_us")
    val a = EventAnalytics.spikeFlags(ev.repartition(1), "series",
      col("ts_us"), H, 6, 2, 3).collect().map(_.toString).sorted
    val b = EventAnalytics.spikeFlags(ev.repartition(8), "series",
      col("ts_us"), H, 6, 2, 3).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("resample spine is per user — no cross-user bleed") {
    val ev = Seq((1L, 0L, 1.0), (1L, 2 * H, 1.0), (2L, 5 * H, 7.0))
      .toDF("user_id", "ts_us", "value")
    val got = EventAnalytics.resampleHourly(ev, "user_id", col("ts_us"),
        col("value"))
      .groupBy("user_id").agg(count(lit(1)).as("n"),
        min("hour_us").as("lo"), max("hour_us").as("hi"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 0L, 2 * H), (2L, 1L, 5 * H, 5 * H)))
  }

  test("linear attribution: exact ppm split, remainder to the last touch") {
    val touches = Seq((10L, 1L, 100L), (11L, 1L, 200L), (12L, 1L, 300L))
      .toDF("touch_id", "user_id", "touch_us")
    val convs = Seq((90L, 1L, 350L)).toDF("conv_id", "user_id", "conv_us")
    val out = EventAnalytics.linearAttribution(touches, "touch_id",
        convs, "conv_id", "user_id", "touch_us", "conv_us", windowUs = 1000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 10^6 over 3 touches: 333333 each, +1 remainder to the LATEST touch
    assert(out(10L) === ((1L, 333333L)))
    assert(out(11L) === ((1L, 333333L)))
    assert(out(12L) === ((1L, 333334L)))
    assert(out.values.map(_._2).sum === 1000000L) // conservation
  }

  test("linear attribution: window bounds and multi-conversion sums") {
    val touches = Seq((10L, 1L, 100L), (11L, 1L, 5000L), (12L, 2L, 100L))
      .toDF("touch_id", "user_id", "touch_us")
    val convs = Seq(
      (90L, 1L, 600L),   // only touch 10 in [100, 1100]
      (91L, 1L, 5500L),  // only touch 11 (10 is 5400us earlier, outside)
      (92L, 1L, 5800L),  // only touch 11 again
      (93L, 3L, 100L)    // no touches for user 3 → contributes nothing
    ).toDF("conv_id", "user_id", "conv_us")
    val out = EventAnalytics.linearAttribution(touches, "touch_id",
        convs, "conv_id", "user_id", "touch_us", "conv_us", windowUs = 1000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(10L) === ((1L, 1000000L)))
    assert(out(11L) === ((2L, 2000000L))) // full credit for both conversions
    assert(!out.contains(12L))            // other user's touch never credited
  }

  test("abMetrics: stable arms, per-user dedup, exact ppm conversion") {
    import graft.functions.Sampling
    val ev = Seq(
      (1L, "view"), (1L, "purchase"), (1L, "purchase"), // converter, 3 events
      (2L, "view"), (2L, "click"),                      // non-converter
      (3L, "purchase")                                  // converter
    ).toDF("user_id", "event_type")
    val arms = ev.select($"user_id",
        Sampling.stableBucket($"user_id", 2).as("arm"))
      .distinct().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = EventAnalytics.abMetrics(ev, "user_id",
        col("event_type") === "purchase", arms = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // rebuild the expectation from the same stable assignment
    val expect = Map(1L -> (true, 3L), 2L -> (false, 2L), 3L -> (true, 1L))
      .groupBy { case (u, _) => arms(u) }
      .map { case (arm, m) =>
        val users = m.size.toLong
        val conv = m.values.count(_._1).toLong
        arm -> ((users, conv, m.values.map(_._2).sum, 1000000L * conv / users))
      }
    assert(out === expect)
    assert(out.values.map(_._1).sum === 3L) // every user in exactly one arm
  }

  test("abMetrics rejects a single-arm experiment") {
    val ev = Seq((1L, "view")).toDF("user_id", "event_type")
    intercept[IllegalArgumentException] {
      EventAnalytics.abMetrics(ev, "user_id", lit(true), arms = 1)
    }
  }

  test("transitionMatrix: hand-checked steps, ppm rows sum per source") {
    val ev = Seq(
      (1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "a", 30L), // a→b→a
      (4L, 2L, "a", 10L), (5L, 2L, "b", 20L),                     // a→b
      (6L, 3L, "c", 10L)                                          // no step
    ).toDF("event_id", "user_id", "event_type", "ts_us")
    val out = EventAnalytics.transitionMatrix(ev, "user_id", "event_id",
        "event_type", col("ts_us"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(("a", "b")) === ((2L, 1000000L))) // a only ever goes to b
    assert(out(("b", "a")) === ((1L, 1000000L)))
    assert(out.size === 2) // user 3's lone event contributes no step
  }

  test("transitionMatrix: equal timestamps order by event id (total order)") {
    val ev = Seq(
      (7L, 1L, "x", 10L), (8L, 1L, "y", 10L), (9L, 1L, "z", 10L)
    ).toDF("event_id", "user_id", "event_type", "ts_us")
    val out = EventAnalytics.transitionMatrix(ev, "user_id", "event_id",
        "event_type", col("ts_us"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("x", "y"), ("y", "z"))) // id order, deterministic
  }

  test("topPaths: gap sessionization, truncated paths, ranked counts") {
    val G = 1000L // gap threshold for the test
    val df = Seq(
      // u1 session 1: a>b>c ; session 2 (after gap): a>b
      (1L, 0L, 10L, "a"), (1L, 10L, 11L, "b"), (1L, 20L, 12L, "c"),
      (1L, 5000L, 13L, "a"), (1L, 5010L, 14L, "b"),
      // u2 one session: a>b
      (2L, 0L, 20L, "a"), (2L, 10L, 21L, "b"),
      // u3 one long session: 7 events, path truncated to first 5
      (3L, 0L, 30L, "x"), (3L, 1L, 31L, "x"), (3L, 2L, 32L, "x"),
      (3L, 3L, 33L, "x"), (3L, 4L, 34L, "x"), (3L, 5L, 35L, "x"),
      (3L, 6L, 36L, "x")
    ).toDF("user_id", "ts_us", "event_id", "etype")
    val got = EventAnalytics.topPaths(df, "user_id", col("ts_us"),
      "event_id", "etype", gapUs = G, maxLen = 5, topK = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1, "a>b", 2L), (2, "a>b>c", 1L), (3, "x>x>x>x>x", 1L)))
  }

  test("topPaths: simultaneous events order by event id (total order)") {
    val df = Seq(
      (1L, 0L, 2L, "b"), (1L, 0L, 1L, "a")
    ).toDF("user_id", "ts_us", "event_id", "etype")
    val got = EventAnalytics.topPaths(df, "user_id", col("ts_us"),
      "event_id", "etype", gapUs = 100L, maxLen = 5, topK = 5)
      .collect().map(_.getString(1))
    assert(got.toSeq === Seq("a>b"))
  }

  test("decayScores halves per half-life via exact right shift") {
    val D = 86400000000L // one day in µs
    val df = Seq(
      (1L, 3 * D, "buy"),     // age 0 → full 1000000
      (1L, 2 * D, "buy"),     // age 1 → 500000
      (1L, 0L, "buy"),        // age 3 → 125000
      (2L, 3 * D - 1, "buy"), // age 0 (floor of 1µs short of a day)
      (2L, 0L, "junk")        // unknown type → weight 0
    ).toDF("user_id", "ts_us", "etype")
    val got = EventAnalytics.decayScores(df, "user_id", col("ts_us"),
      "etype", Seq("buy" -> 1000000L), halfLifeUs = D)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got(1L) == ((3L, 1625000L, 0L)))
    assert(got(2L) == ((2L, 1000000L, 0L)))
  }

  test("decayScores zeroes contributions past 63 half-lives") {
    val df = Seq((1L, 100L * 64, "buy"), (1L, 0L, "buy"))
      .toDF("user_id", "ts_us", "etype")
    val got = EventAnalytics.decayScores(df, "user_id", col("ts_us"),
      "etype", Seq("buy" -> 1000000L), halfLifeUs = 100L)
      .collect().head
    // age-64 event contributes 0, not an overflowing shift
    assert(got.getLong(2) == 1000000L)
  }

  test("decayScores references the snapshot max, not wall clock") {
    val df = Seq((1L, 500L, "buy")).toDF("user_id", "ts_us", "etype")
    val got = EventAnalytics.decayScores(df, "user_id", col("ts_us"),
      "etype", Seq("buy" -> 1000000L), halfLifeUs = 100L)
      .collect().head
    assert(got.getLong(2) == 1000000L && got.getLong(3) == 0L)
  }

  test("stickiness: trailing-7-day WAU, dedup within day, daily user " +
      "pins 1e6") {
    import org.apache.spark.sql.functions.{col, to_date}
    val ev = Seq(
      // user 1 active on day 1 and day 8 (outside each other's window);
      // user 2 active only day 1 (twice — must dedup); user 3 only day 8
      (1L, "2024-01-01"), (1L, "2024-01-08"),
      (2L, "2024-01-01"), (2L, "2024-01-01"),
      (3L, "2024-01-08")).toDF("user_id", "d")
    val out = EventAnalytics.stickiness(ev, "user_id", to_date(col("d")))
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // day 1: DAU {1,2}; WAU (days -6..0 → just day 1 activity) = {1,2}
    assert(out("2024-01-01") === ((2L, 2L, 1000000L)))
    // day 8: DAU {1,3}; trailing week covers Jan 2-8 → only day-8 users
    assert(out("2024-01-08") === ((2L, 2L, 1000000L)))
    // Jan 2-7 had no activity → no rows (active-day semantics)
    assert(out.size === 2)
    // add a day-4 event for user 2: its WAU window (Jan 4..) reaches day 8
    val ev2 = ev.union(Seq((2L, "2024-01-04")).toDF("user_id", "d"))
    val out2 = EventAnalytics.stickiness(ev2, "user_id", to_date(col("d")))
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // day 8 WAU now {1, 2, 3} → stickiness floor(2e6/3)
    assert(out2("2024-01-08") === ((2L, 3L, 666666L)))
  }

  test("cupedAbMetrics: with a perfectly correlated covariate (y = 2x) " +
      "the adjusted means collapse to the pooled outcome mean") {
    // users chosen so stableBucket splits them across both arms; x per
    // user varies, y = 2x exactly ⇒ θ = 2 and y − θ(x − x̄) = 2x̄ for
    // every user — adjusted means equal across arms even though raw
    // means differ
    val users = (1L to 40L)
    val rows = users.flatMap { u =>
      val x = (u % 7 + 1).toDouble // covariate value
      Seq((u, "view", x), (u, "purchase", 2 * x))
    }
    import spark.implicits._
    val ev = rows.toDF("user_id", "event_type", "value")
    val out = EventAnalytics.cupedAbMetrics(ev, "user_id",
        col("event_type") === "view", col("event_type") === "purchase",
        col("value"), arms = 2)
      .collect().map(r => r.getAs[Long]("arm") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("mean_y_us"),
          r.getAs[Long]("adj_mean_y_us")))).toMap
    assert(out.size == 2)
    val Seq(a, b) = out.values.toSeq
    assert(a._1 + b._1 == 40L)
    // pooled mean of y in µ = 2·x̄·1e6; both adjusted means hit it
    val xbar = users.map(u => (u % 7 + 1).toDouble).sum / 40
    val pooled = math.floor(2 * xbar * 1e6).toLong
    assert(a._3 == pooled && b._3 == pooled,
      s"adjusted means $a $b, pooled $pooled")
    // and the raw means genuinely differed (the adjustment did work)
    assert(a._2 != b._2)
  }

  test("cupedAbMetrics: zero covariate variance degrades to raw means " +
      "(theta = 0, no division by zero)") {
    import spark.implicits._
    val ev = (1L to 10L).flatMap(u =>
      Seq((u, "view", 5.0), (u, "purchase", u.toDouble)))
      .toDF("user_id", "event_type", "value")
    val out = EventAnalytics.cupedAbMetrics(ev, "user_id",
        col("event_type") === "view", col("event_type") === "purchase",
        col("value"), arms = 2)
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(
      r.getAs[Long]("adj_mean_y_us") == r.getAs[Long]("mean_y_us")))
  }
}
