package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** RAKE keyphrase extraction (Rose et al. 2010, "Automatic keyword
  * extraction from individual documents"): candidate phrases are maximal
  * runs of non-stopword tokens; each word scores deg(w)/freq(w) over the
  * phrase corpus (deg summing the lengths of the phrases it appears in),
  * and a phrase scores the sum of its words' scores — long cohesive
  * phrases of rare-but-connected words win.
  *
  * Determinism: per-word ratios are ONE IEEE division each (bit-identical
  * across engines), then cast to DECIMAL(27,12) before the per-phrase sum
  * (the bm25 rule — decimal summation is accumulation-order-free), and the
  * final ranking orders on the exact decimal with a phrase tie-break.
  *
  * Scale shape: phrase segmentation is one per-document window (sort
  * bounded by document length — the sessionize shape); word stats and
  * phrase scores are vocabulary-/phrase-bounded aggregations; the final
  * ranking is `orderBy().limit()` (TakeOrderedAndProject). */
object Rake {

  /** Stopword list shared verbatim with the SQL oracle (interpolated into
    * the IN list there — the never-drift rule). */
  val DefaultStops: Seq[String] = Seq("a", "an", "and", "the", "of", "to",
    "in", "is", "are", "for", "or", "with", "on", "as", "by")

  /** Corpus-wide top-k phrases: (phrase, n_occurrences, score). */
  def topPhrases(docs: DataFrame, idCol: String, textCol: String,
                 stops: Seq[String] = DefaultStops, topK: Int): DataFrame = {
    require(stops.nonEmpty && topK >= 1, "bad stops/topK")
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val phrases = toks
      .filter(!col("tok").isin(stops: _*))
      .withColumn("_isl", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("_isl"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
        _.getField("tok")).as("words"))
      .withColumn("len", size(col("words")).cast("long"))
      .withColumn("phrase", array_join(col("words"), " "))
      // two consumers (word stats, phrase scoring) — persist or the
      // window segmentation runs twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wordStats = phrases
      .select(explode(col("words")).as("tok"), col("len"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("_freq"), sum(col("len")).as("_deg"))
    val scored = phrases
      .select(col("doc_id"), col("_isl"), col("phrase"),
        explode(col("words")).as("tok"))
      .join(wordStats, Seq("tok"))
      .groupBy(col("doc_id"), col("_isl"), col("phrase"))
      .agg(sum((col("_deg").cast("double") / col("_freq"))
        .cast(DecimalType(27, 12))).as("_s"))
    scored
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"), max(col("_s")).as("_s"))
      .orderBy(col("_s").desc, col("phrase").asc)
      .limit(topK)
      .select(col("phrase"), col("n_occurrences"),
        round(col("_s").cast("double"), 6).as("score"))
  }
}
