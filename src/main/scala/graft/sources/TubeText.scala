package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the reference's raw graph-table dump format (S2–S6 in
  * SURVEY.md §2.1): quoted-CSV text, one directory of part files per table.
  *
  * Node row:  `created, acl, _sysan, _props, node_id` — `_props` is a JSON
  * object holding all entity properties (reference: tube/etl/indexers/base/
  * lambdas.py:10-61; example fixture at tests/dataframe_tests/test_data/
  * ibdgc/graphs/node_participant/part-m-00000).
  * Edge row:  `created, acl, _sysan, _props, src_id, dst_id` with
  * src = child, dst = parent (lambdas.py:64-71).
  *
  * The reference hand-rolls quote unescaping (`'`→`###`, `""`→`##`) plus
  * `ast.literal_eval`; we use Spark's native CSV reader (quote `"`, escape
  * `""`) and `from_json` — all Catalyst expressions, fully codegen'd, and
  * splittable across executors (the reference's `wholeTextFiles` edge scan
  * reads each file on ONE task; `read.csv` splits by HDFS block).
  *
  * Missing/empty table directory ⇒ typed EMPTY DataFrame, not failure —
  * load-bearing semantics (reference: base/translator.py:94-117).
  */
object TubeText {

  private def readCsv(spark: SparkSession, dir: String, nCols: Int): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasFiles = fs.exists(path) && fs.listStatus(path)
      .exists(s => s.isFile && s.getLen > 0 && !s.getPath.getName.startsWith("_"))
    if (!hasFiles) None
    else Some(
      spark.read
        .option("quote", "\"")
        .option("escape", "\"")
        .option("multiLine", "false")
        .schema(StructType((0 until nCols).map(i =>
          StructField(s"_c$i", StringType))))
        .csv(dir))
  }

  /** Node table → DataFrame with `_{label}_id` + one typed column per prop
    * in `propsSchema` (extracted from the `_props` JSON). */
  def nodes(spark: SparkSession, dir: String, label: String,
            propsSchema: StructType): DataFrame = {
    val idCol = s"_${label}_id"
    readCsv(spark, dir, 5) match {
      case Some(raw) =>
        raw.select(
          col("_c4").alias(idCol),
          from_json(col("_c3"), propsSchema).alias("_p"))
          .select(col(idCol) +: propsSchema.fieldNames.map(f => col(s"_p.$f")): _*)
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(StructField(idCol, StringType) +: propsSchema.fields))
    }
  }

  /** Edge table → (childIdCol, parentIdCol). `reverse=true` swaps roles
    * (reference extract_link_reverse, lambdas.py:74-76). */
  def edges(spark: SparkSession, dir: String, childIdCol: String,
            parentIdCol: String, reverse: Boolean = false): DataFrame = {
    val (srcAs, dstAs) = if (reverse) (parentIdCol, childIdCol)
                         else (childIdCol, parentIdCol)
    readCsv(spark, dir, 6) match {
      case Some(raw) =>
        raw.select(col("_c4").alias(srcAs), col("_c5").alias(dstAs))
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField(srcAs, StringType),
                         StructField(dstAs, StringType))))
    }
  }
}
