package graft.functions

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** The reliable-checkpoint knob: iterative operators truncate lineage via
  * `Frames.truncate`, which upgrades from executor-local `localCheckpoint`
  * to a fault-tolerant `checkpoint()` whenever the SparkContext has a
  * checkpoint directory configured (the standard cluster-side setting).
  * Results must be bit-identical in both modes — only the storage of the
  * truncation point differs. */
class CheckpointModeSpec extends SparkSpec {
  import spark.implicits._

  private def pairs: DataFrame = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (20L, 21L),
    (4L, 1L), (12L, 10L))
    .toDF("id_a", "id_b")

  private def edges: DataFrame = {
    val d = pairs.toDF("src", "dst")
    d.union(d.select($"dst", $"src"))
  }

  /** Runs `body` with a reliable checkpoint dir configured, restoring the
    * no-dir default afterwards so other suites keep the local mode. The
    * `checkpointDir` member is private[spark]; its generated setter is
    * public in bytecode, which is what the restore uses. */
  private def withCheckpointDir[T](body: java.nio.file.Path => T): T = {
    val sc = spark.sparkContext
    val dir = Files.createTempDirectory("graft-ckpt")
    sc.setCheckpointDir(dir.toString)
    var bodyOk = false
    try { val r = body(dir); bodyOk = true; r }
    finally {
      val reset = scala.util.Try(
        sc.getClass.getMethod("checkpointDir_$eq", classOf[Option[_]])
          .invoke(sc, None)).isSuccess && sc.getCheckpointDir.isEmpty
      // fail LOUDLY when the Spark-internal setter is renamed away: a
      // silent no-op would leave every later suite in this shared JVM
      // running in reliable-checkpoint mode. Only thrown when the body
      // itself passed, so a real test failure is never masked.
      if (!reset && bodyOk)
        throw new IllegalStateException("checkpointDir reflective reset " +
          "failed — Spark internal `checkpointDir_$eq` renamed? Later " +
          "suites would inherit reliable-checkpoint mode.")
    }
  }

  test("componentsFromPairs and PageRank: reliable mode is bit-identical to local mode") {
    val localCc = Dedup.componentsFromPairs(pairs, iters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val localPr = PageRank.run(edges, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(spark.sparkContext.getCheckpointDir.isEmpty)

    withCheckpointDir { dir =>
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val relCc = Dedup.componentsFromPairs(pairs, iters = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val relPr = PageRank.run(edges, "src", "dst", iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(relCc === localCc)
      assert(relPr === localPr)
      // the reliable path actually wrote checkpoint data to the dir
      val s = Files.walk(dir)
      try assert(s.filter(p => p.getFileName.toString.startsWith("rdd-"))
        .findFirst().isPresent)
      finally s.close()
    }

    // restored: back to local mode for the rest of the JVM
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val againCc = Dedup.componentsFromPairs(pairs, iters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(againCc === localCc)
  }

  test("kCorePeel and Lpa: reliable mode matches local mode") {
    val localK = Triangles.kCorePeel(pairs, "id_a", "id_b", k = 2, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val localL = Lpa.communities(pairs, "id_a", "id_b", rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    withCheckpointDir { _ =>
      val relK = Triangles.kCorePeel(pairs, "id_a", "id_b", k = 2, rounds = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val relL = Lpa.communities(pairs, "id_a", "id_b", rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(relK === localK)
      assert(relL === localL)
    }
  }
}
