package graft.sinks

import org.apache.spark.sql.DataFrame

/** Document sinks (SURVEY §2.1 S7/S9). The engine's default sink is
  * columnar (Parquet) or JSON-lines; Elasticsearch lives behind the same
  * trait so the ES connector (not shipped in this environment) can slot in
  * without touching the pipeline. Writes keep natural partitioning — the
  * reference's `coalesce(1)` single-task ES write
  * (tube/etl/outputs/es/writer.py:59) is a deliberate divergence: a
  * single-writer sink caps throughput at one task regardless of cluster
  * size. */
trait DocumentSink {
  def write(docs: DataFrame, docType: String): Unit
}

/** `partitionBy` columns give hive-style directory partitioning — the
  * standard at-scale layout (per-day / per-source dirs) that turns
  * downstream partition filters into directory pruning instead of scans. */
final class ParquetSink(baseDir: String, partitionCols: Seq[String] = Nil)
    extends DocumentSink {
  def write(docs: DataFrame, docType: String): Unit = {
    val w = docs.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$baseDir/$docType")
  }
}

final class JsonSink(baseDir: String) extends DocumentSink {
  def write(docs: DataFrame, docType: String): Unit =
    docs.write.mode("overwrite").json(s"$baseDir/$docType")
}
