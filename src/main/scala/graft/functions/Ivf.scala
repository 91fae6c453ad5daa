package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor: coarse-quantize the
  * corpus into K centroid cells; a query scores only the vectors in its
  * `nprobe` nearest cells. The scale path complements `Similarity.lshTopK`:
  * IVF gives tunable recall/cost via (K, nprobe) and its partitioning is
  * explicit — each cell is a shuffle partition, so a 100 TB corpus
  * pre-partitioned by cell serves queries by touching nprobe/K of the data.
  *
  * Training is a deterministic mini k-means: init = the K lowest-id
  * vectors, a fixed number of Lloyd iterations, all expressed as DataFrame
  * ops (assign = broadcast-centroids argmax; update = per-dimension mean
  * via posexplode). No RNG, so results are reproducible across runs and
  * cluster layouts.
  */
object Ivf {

  private def dot(a: Column, b: Column): Column = Similarity.dot(a, b)

  /** Assign each row its nearest centroid id by cosine (centroid set is
    * broadcast — K is small by construction). */
  private def assign(vecs: DataFrame, idCol: String, vecCol: String,
                     normCol: String, centroids: DataFrame): DataFrame = {
    val scored = vecs.join(broadcast(centroids))
      .withColumn("_sim",
        dot(col(vecCol), col("cvec")) / (col(normCol) * col("cnorm")))
    scored.groupBy(col(idCol))
      .agg(max_by(col("cid"), struct(col("_sim"), -col("cid"))).as("cell"))
  }

  private def withNorm(df: DataFrame, vecCol: String, as: String): DataFrame =
    df.withColumn(as, sqrt(dot(col(vecCol), col(vecCol))))

  /** Deterministic k-means over the corpus: returns (cid, cvec, cnorm).
    * The returned centroid frame stays persisted (it is joined repeatedly by
    * index/search); each Lloyd iteration materializes the NEW centroids
    * before releasing the previous iteration's cache, so at most one
    * (k-row) frame is ever cached — not one per iteration. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int = 2): DataFrame = {
    val vecs = withNorm(corpus.select(col(idCol), col(vecCol)), vecCol, "_vn")
    var centroids = withNorm(
      vecs.orderBy(col(idCol)).limit(k)
        .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec")),
      "cvec", "cnorm")
    var cached: DataFrame = null
    for (_ <- 0 until iters) {
      val assigned = assign(vecs, idCol, vecCol, "_vn", centroids)
        .join(vecs, Seq(idCol))
      // per-dimension mean of member vectors → new centroid
      val dims = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
      val rebuilt = dims.groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cid"),
          transform(col("pm"), p => p.getField("m")).as("cvec"))
      centroids = withNorm(rebuilt, "cvec", "cnorm")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      centroids.count() // materialize before dropping the previous cache
      if (cached != null) cached.unpersist(false)
      cached = centroids
    }
    centroids
  }

  /** Quantized corpus: one row per vector with its cell id and norm. */
  private def index(corpus: DataFrame, corpusId: String, corpusVec: String,
                    centroids: DataFrame): DataFrame = {
    val cvecs = withNorm(corpus.select(col(corpusId), col(corpusVec)),
      corpusVec, "_cn")
    assign(cvecs, corpusId, corpusVec, "_cn", centroids)
      .join(cvecs, Seq(corpusId))
  }

  /** Probe + score against an already-quantized corpus. */
  private def search(indexed: DataFrame, corpusId: String, corpusVec: String,
                     centroids: DataFrame, queries: DataFrame, queryId: String,
                     queryVec: String, k: Int, nprobe: Int): DataFrame = {
    val qvecs = withNorm(queries.select(col(queryId), col(queryVec)),
      queryVec, "_qn")
    // nprobe nearest cells per query
    val probes = qvecs.join(broadcast(centroids))
      .withColumn("_sim", dot(col(queryVec), col("cvec")) / (col("_qn") * col("cnorm")))
      .withColumn("_pr", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("_sim").desc, col("cid").asc)))
      .filter(col("_pr") <= nprobe)
      .select(col(queryId), col(queryVec), col("_qn"), col("cid").as("cell"))
    val scored = indexed.join(probes, Seq("cell"))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("sim", dot(col(corpusVec), col(queryVec)) / (col("_cn") * col("_qn")))
    // two-stage top-k (Similarity.topKPerQuery): probing bounds candidates
    // per query only probabilistically — a hot cell can still be most of
    // the corpus, so the single-reducer window is as unsafe here as in the
    // brute path
    Similarity.topKPerQuery(scored, queryId, corpusId, k)
  }

  /** Top-k neighbors per query, probing the `nprobe` nearest cells.
    * Trains in-line — for repeated query batches use `buildIndex` +
    * `topKIndexed` so training and quantization are paid once. */
  def topK(corpus: DataFrame, corpusId: String, corpusVec: String,
           queries: DataFrame, queryId: String, queryVec: String,
           k: Int, numCells: Int, nprobe: Int, iters: Int = 2): DataFrame = {
    val centroids = train(corpus, corpusId, corpusVec, numCells, iters)
    search(index(corpus, corpusId, corpusVec, centroids), corpusId, corpusVec,
      centroids, queries, queryId, queryVec, k, nprobe)
  }

  /** Build the IVF index ONCE and persist it: centroids (tiny parquet) plus
    * the corpus quantized and laid out BY CELL via hive partitioning. A
    * 100 TB corpus indexed this way serves each query batch by reading only
    * the probed cell directories (partition pruning / dynamic partition
    * pruning through the cell join) — no re-training, no full rescan. */
  def buildIndex(corpus: DataFrame, corpusId: String, corpusVec: String,
                 path: String, numCells: Int, iters: Int = 2): Unit = {
    val centroids = train(corpus, corpusId, corpusVec, numCells, iters)
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    index(corpus, corpusId, corpusVec, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Top-k against a persisted index (see `buildIndex`). */
  def topKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                  corpusId: String, corpusVec: String,
                  queries: DataFrame, queryId: String, queryVec: String,
                  k: Int, nprobe: Int): DataFrame =
    search(spark.read.parquet(s"$path/cells"), corpusId, corpusVec,
      spark.read.parquet(s"$path/centroids"),
      queries, queryId, queryVec, k, nprobe)
}
