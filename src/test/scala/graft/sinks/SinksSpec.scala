package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet sink writes hive-style dirs; reads prune by partition") {
    val base = java.nio.file.Files.createTempDirectory("sink").toString
    val docs = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-02", "b"))
      .toDF("id", "day", "v")
    new ParquetSink(base, partitionCols = Seq("day")).write(docs, "events")
    val dirs = new java.io.File(s"$base/events").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("day=2024-01-01", "day=2024-01-02"))
    val read = spark.read.parquet(s"$base/events").filter($"day" === "2024-01-01")
    assert(read.collect().map(_.getAs[Long]("id")).toSeq === Seq(1L))
  }

  test("json sink round-trips documents") {
    val base = java.nio.file.Files.createTempDirectory("sinkj").toString
    new JsonSink(base).write(Seq((1L, "x")).toDF("id", "v"), "docs")
    assert(spark.read.json(s"$base/docs").count() === 1L)
  }
}
