package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the test corpus layout: `{dir}/{name}.parquet`.
  * Column pruning + predicate pushdown reach the scan automatically because
  * callers select/filter on the returned lazy DataFrame. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
