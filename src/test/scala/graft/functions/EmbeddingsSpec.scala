package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("dimStats reports integer-µ moments per dimension") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, -0.5f)),
      (2L, Seq(3.0f, 0.0f, 0.5f))
    ).toDF("id", "vec")
    val rows = Embeddings.dimStats(df, "vec").orderBy("dim").collect()
    assert(rows.length == 3)
    // dim 0: values 1e6, 3e6 → mean 2e6, var = ((2*10e12)-(4e6)^2)/4 = 1e12
    val d0 = rows(0)
    assert(d0.getLong(1) == 2L)            // n
    assert(d0.getLong(2) == 2000000L)      // mean_us
    assert(d0.getLong(3) == 1000000000000L) // var_us2
    assert(d0.getLong(4) == 1000000L && d0.getLong(5) == 3000000L)
    assert(d0.getLong(6) == 0L)
    // dim 1: dead dimension — zero mean, zero var, all zeros
    val d1 = rows(1)
    assert(d1.getLong(2) == 0L && d1.getLong(3) == 0L && d1.getLong(6) == 2L)
    // dim 2: symmetric ±0.5 → mean 0, var (0.5e6)^2 = 2.5e11
    val d2 = rows(2)
    assert(d2.getLong(2) == 0L && d2.getLong(3) == 250000000000L)
  }

  test("negative mean floor-divides (engine-exact vs a truncating //)") {
    val df = Seq((1L, Seq(-1.0f)), (2L, Seq(-2.0f)), (3L, Seq(2.0f)))
      .toDF("id", "vec")
    val r = Embeddings.dimStats(df, "vec").collect().head
    // sum = -1e6 over n=3 → floor(-333333.33) = -333334, NOT -333333
    assert(r.getLong(2) == -333334L)
  }

  test("plan shape: one aggregate over the explode, no join/window") {
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "vec")
    val plan = Embeddings.dimStats(df, "vec")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
  }
}
