package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale probes for operators whose realistic operating point is
  * NOT the oracle-gated query configuration — selection at k in the
  * hundreds (the gated queries run k=3–5 for SQL-unrollable oracles) and
  * BPE serving with a 1000+-merge table (the gated query replays 6
  * merges in DuckDB). `Bench` times the gated configurations; this main
  * times the operating-point ones for SCALE.md rows.
  *
  * Usage: ScaleProbe <sfDir> <op> [args...]; prints one JSON line.
  *   maxcover_exact <k> | maxcover_celf <k> | maxcover_stochastic <k> <pct>
  *   kcenter <k> | kcenter_batched <k> <batch> | bpe_trie <merges>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val op = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docsShingled = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
    def emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    val t0 = System.nanoTime()
    var extra = ""
    val rows: Long = op match {
      case "maxcover_exact" =>
        functions.Sampling.maxCoverSelect(docsShingled, "doc_id", "sh",
          args(2).toInt).count()
      case "maxcover_celf" =>
        functions.Sampling.maxCoverSelectCelf(docsShingled, "doc_id", "sh",
          args(2).toInt).count()
      case "maxcover_stochastic" =>
        functions.Sampling.maxCoverSelectStochastic(docsShingled, "doc_id",
          "sh", args(2).toInt, args(3).toInt).count()
      case "kcenter" =>
        functions.Similarity.kCenterSelect(emb, "vec_id", "embedding",
          args(2).toInt).count()
      case "kcenter_batched" =>
        functions.Similarity.kCenterSelectBatched(emb, "vec_id", "embedding",
          args(2).toInt, args(3).toInt).count()
      case "bpe_trie" =>
        // serving shape: vocabulary aggregated once, trained driver-local
        // at realistic merge count, then ONE encodeWords pass over the
        // whole vocabulary (the fold path would be args(2) chained
        // expression nodes — unbuildable at this size)
        val words = functions.Bpe.wordCounts(
          spark.read.parquet(s"$dir/documents.parquet"), col("text"))
          .localCheckpoint(true)
        val merges = functions.Bpe.trainLocal(words, "word", "freq",
          numMerges = args(2).toInt, minCount = 1L)
        extra = s""","merges":${merges.size}"""
        val enc = functions.Bpe.encodeWords(words, "word", merges)
          .agg(count(lit(1)), sum(size(col("sym")))).collect()
        enc(0).getLong(0)
      case other => sys.error(s"unknown op $other")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(s"""{"probe":"$op","dir":"$dir","args":"${args.drop(2).mkString(",")}","rows":$rows$extra,"secs":${math.round(secs * 10) / 10.0}}""")
    spark.stop()
  }
}
