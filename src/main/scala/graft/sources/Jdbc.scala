package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — relational bulk import, replacing the reference's out-of-band Sqoop
  * subprocess (tube/importers/sql_to_hdfs.py:36-137, PARALLEL_JOBS=1) with
  * Spark's own JDBC source: no external MapReduce job, no text round-trip
  * through HDFS, and real read parallelism via predicate partitioning.
  *
  * Scale notes: `partitionColumn/numPartitions` splits the table across
  * executors (the reference imports with ONE mapper); column pruning and
  * filter pushdown reach the database as SQL. For graph node tables the
  * natural partition column is the serial PK; for edge tables, src_id.
  */
object Jdbc {

  final case class Conn(url: String, user: String, password: String,
                        driver: String = "org.postgresql.Driver")

  def readTable(spark: SparkSession, conn: Conn, table: String): DataFrame =
    reader(spark, conn).option("dbtable", table).load()

  /** Range-partitioned parallel read: each executor fetches one slice of
    * `[lower, upper]` on `partitionCol`. */
  def readTablePartitioned(spark: SparkSession, conn: Conn, table: String,
                           partitionCol: String, lower: Long, upper: Long,
                           numPartitions: Int): DataFrame =
    reader(spark, conn)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** The reference excludes transaction/audit tables from import
    * (sql_to_hdfs.py:63-77); mirrored as a plain name filter the caller
    * applies to its table list. */
  def importWorthy(table: String): Boolean =
    !table.startsWith("transaction_") && table != "alembic_version"

  /** S1 bulk-import orchestration (reference sql_to_hdfs.py:96-137
    * `import-all-tables`, one Sqoop subprocess per table with ONE mapper):
    * dump every import-worthy table to `outDir/<table>` as parquet — the
    * layout `TubeGraphSource` consumes directly, so a live database feeds
    * `RunEtl` with no intermediate text format. Tables listed in
    * `partitionCols` get range-partitioned parallel reads (bounds fetched
    * as a pushed-down one-row MIN/MAX); the rest read single-stream (the
    * right default for small dimension tables). Returns the dumped table
    * names. */
  def dumpAll(spark: SparkSession, conn: Conn, tables: Seq[String],
              outDir: String, partitionCols: Map[String, String] = Map.empty,
              numPartitions: Int = 8): Seq[String] =
    tables.filter(importWorthy).map { tbl =>
      val df = partitionCols.get(tbl) match {
        case Some(pc) =>
          val b = readTable(spark, conn,
            s"(SELECT MIN($pc) AS lo, MAX($pc) AS hi FROM $tbl) b").collect()(0)
          if (b.isNullAt(0)) readTable(spark, conn, tbl) // empty table
          else readTablePartitioned(spark, conn, tbl, pc,
            b.getAs[Number](0).longValue, b.getAs[Number](1).longValue,
            numPartitions)
        case None => readTable(spark, conn, tbl)
      }
      df.write.mode("overwrite").parquet(s"$outDir/$tbl")
      tbl
    }

  /** S11 source side — the latest SUCCEEDED transaction time (epoch millis)
    * from `transaction_logs`, the scalar feeding `EsControl.needsRun`
    * (reference: tube/etl/outputs/es/timestamp.py:20-44 reads the newest
    * succeeded row; MAX over the same predicate is the identical scalar and
    * is dialect-portable). Pushed down as a one-row dbtable subquery so the
    * database does the aggregation — no table scan into Spark. */
  def latestSucceededTxMillis(spark: SparkSession, conn: Conn): Option[Long] = {
    val q = "(SELECT MAX(created_datetime) AS latest FROM transaction_logs " +
      "WHERE state = 'SUCCEEDED') t"
    readTable(spark, conn, q).collect()
      .headOption.filter(!_.isNullAt(0))
      .map(_.getTimestamp(0).getTime)
  }

  private def reader(spark: SparkSession, conn: Conn) =
    spark.read.format("jdbc")
      .option("url", conn.url)
      .option("user", conn.user)
      .option("password", conn.password)
      .option("driver", conn.driver)
      .option("fetchsize", "10000")
}
