package graft.schema

import graft.SparkSpec

class FilterDslSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "F", 10.0, Seq("a", "b")),
    (2L, "O", 200.0, Seq("b")),
    (3L, "P", 150.0, Seq.empty[String]))
    .toDF("id", "status", "price", "tags")

  private def ids(node: FilterNode): Set[Long] =
    df.filter(FilterDsl.compile(node)).select("id").collect().map(_.getLong(0)).toSet

  test("leaf comparisons") {
    assert(ids(FilterLeaf("=", "status", "F")) === Set(1L))
    assert(ids(FilterLeaf(">", "price", 100)) === Set(2L, 3L))
    assert(ids(FilterLeaf("in", "status", Seq("F", "P"))) === Set(1L, 3L))
    assert(ids(FilterLeaf("contains", "tags", "a")) === Set(1L))
    assert(ids(FilterLeaf("like", "status", "F%")) === Set(1L))
  }

  test("and/or compounds") {
    val node = FilterOr(Seq(
      FilterAnd(Seq(FilterLeaf(">", "price", 100), FilterLeaf("=", "status", "O"))),
      FilterLeaf("contains", "tags", "a")))
    assert(ids(node) === Set(1L, 2L))
  }

  test("json-ish map parsing (reference logic.py shape)") {
    val node = FilterDsl.fromAny(Map(
      "op" -> "and",
      "filters" -> Seq(
        Map("op" -> ">", "prop" -> "price", "value" -> 100),
        Map("op" -> "in", "prop" -> "status", "value" -> Seq("O", "P")))))
    assert(ids(node) === Set(2L, 3L))
  }

  test("unknown op is rejected") {
    assertThrows[IllegalArgumentException] {
      FilterDsl.compile(FilterLeaf("regexpish", "status", "x"))
    }
  }
}
