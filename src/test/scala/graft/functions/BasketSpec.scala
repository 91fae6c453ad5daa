package graft.functions

import graft.SparkSpec

class BasketSpec extends SparkSpec {
  import spark.implicits._

  test("pairStats: hand-checked support and lift") {
    // 4 baskets; {1,2} together twice, {1,3} once
    val items = Seq(
      (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L),
      (13L, 4L)
    ).toDF("bid", "item")
    val out = Basket.pairStats(items, "bid", "item",
        minSupport = 1, topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // lift(1,2) = 4·2/(3·2) = 1.333…, floored ppm
    assert(out((1L, 2L)) === ((2L, 1333333L)))
    // lift(1,3) = 4·1/(3·1) = 1.333…
    assert(out((1L, 3L)) === ((1L, 1333333L)))
    assert(out.size === 2)
  }

  test("pairStats: minSupport filters, topK cuts on the total order") {
    val items = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), // (1,2) support 2
      (3L, 5L), (3L, 6L)                       // (5,6) support 1
    ).toDF("bid", "item")
    val only = Basket.pairStats(items, "bid", "item",
        minSupport = 2, topK = 10).collect()
    assert(only.length === 1 && only.head.getLong(0) === 1L)
    val top1 = Basket.pairStats(items, "bid", "item",
        minSupport = 1, topK = 1).collect()
    assert(top1.length === 1)
    assert((top1.head.getLong(0), top1.head.getLong(1)) === ((1L, 2L)))
  }

  test("pairStats: duplicate line items collapse; mega-baskets drop") {
    val dup = Seq((1L, 7L), (1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L))
      .toDF("bid", "item")
    val out = Basket.pairStats(dup, "bid", "item", 1, 10).collect()
    assert(out.length === 1 && out.head.getLong(2) === 2L)
    val mega = (0L until 20L).map(i => (1L, i)) ++ Seq((2L, 0L), (3L, 0L))
    val capped = Basket.pairStats(mega.toDF("bid", "item"), "bid", "item",
      1, 100, maxBasket = 10)
    assert(capped.collect().isEmpty) // the only multi-item basket is capped
  }

  test("tripleStats: hand-checked support and cohesion; consecutive " +
      "members are not skipped") {
    import spark.implicits._
    // {1,2,3} twice, {1,2,4} once → triple (1,2,3) support 2;
    // pairs: (1,2)=3, (1,3)=2, (2,3)=2 → min pair 2, cohesion 1e6
    val items = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 4L)).toDF("bid", "item")
    val rows = Basket.tripleStats(items, "bid", "item",
      minSupport = 2, topK = 10).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 2L, 3L)))
    assert(r.getLong(3) === 2L)       // support
    assert(r.getLong(4) === 2L)       // min pair support
    assert(r.getLong(5) === 1000000L) // cohesion
  }

  test("tripleStats: a 4-item basket emits all C(4,3)=4 triples") {
    import spark.implicits._
    val items = (1L to 4L).map(i => (1L, i)).toDF("bid", "item")
    val rows = Basket.tripleStats(items, "bid", "item",
      minSupport = 1, topK = 10).collect()
    assert(rows.length === 4)
  }
}
