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
