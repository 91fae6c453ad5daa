package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frames.release actually frees checkpoint storage — and documents the
  * trap it exists for: Dataset.unpersist is a no-op on truncated frames. */
class FramesReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("Dataset.unpersist does NOT free a localCheckpoint's blocks; " +
      "Frames.release does") {
    val before = persistedIds
    val df = Frames.truncate(
      (1 to 1000).toDF("x").withColumn("y", col("x") * 2))
    val added = persistedIds -- before
    assert(added.nonEmpty, "truncate should persist an RDD")
    // the documented trap: unpersist leaves the checkpoint blocks alone
    df.unpersist(true)
    assert((persistedIds -- before) == added,
      "Dataset.unpersist unexpectedly freed the checkpoint (Spark " +
        "behavior changed — release may be simplifiable)")
    Frames.release(df)
    assert((persistedIds -- before).isEmpty,
      s"release left persistent RDDs: ${persistedIds -- before}")
  }

  test("release is a safe no-op on a plain un-persisted frame") {
    val before = persistedIds
    Frames.release((1 to 10).toDF("x"))
    assert(persistedIds == before)
  }

  test("release does NOT free a shared persist()ed cache reached through " +
      "a derived frame (only checkpoint-materialized ancestors qualify)") {
    val before = persistedIds
    val shared = (1 to 1000).toDF("x")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shared.count() // materialize the cache entry
    val added = persistedIds -- before
    assert(added.nonEmpty)
    // a derived (non-truncated) frame: its dependency walk finds the
    // shared cache first — release must refuse to touch it
    val derived = shared.select(col("x") * 2)
    Frames.release(derived)
    assert((persistedIds -- before) == added,
      "release freed a merely-cached shared dataset still in use")
    shared.unpersist(true)
  }
}
