package graft.functions

import org.apache.spark.sql.DataFrame

/** Cache hygiene for operators that persist a shared intermediate. The
  * (small) result frame is materialized eagerly (`localCheckpoint(true)`)
  * so the persisted input can be released before the caller ever runs an
  * action — a lazy return would either leak the cache entry into the
  * session (one per call; a long bench session measured multi-fold GC
  * inflation from exactly this accumulation) or, if unpersisted early,
  * silently recompute the shared intermediate once per consumer.
  *
  * Only call with results that are aggregate-bounded (curves, histograms,
  * top-k frames), never corpus-sized — the checkpoint stores row-format
  * blocks on the executors. */
private[graft] object Frames {
  def sealRelease(out: DataFrame, cached: DataFrame*): DataFrame = {
    val r = out.localCheckpoint(true)
    cached.foreach(_.unpersist(false))
    r
  }
}
