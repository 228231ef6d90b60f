package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executable proof of the "swap GK in unchanged at 100 TB" claim made by
  * the exact-percentile queries (q_mad, q_percentile, q_rfm): the SAME
  * two-pass q_mad plan shape is run twice — once with the exact
  * `percentile` kernel, once with `approx_percentile` (Greenwald–Khanna,
  * accuracy 1000 → rank error ≤ 1/1000) — on a planted deterministic
  * heavy-tailed distribution, and the sketch results are held to:
  *
  *  1. the rank-error bound: the GK median must lie between the exact
  *     quantiles at 0.5 ± 2/accuracy (twice the worst-case guarantee, so
  *     the assert is merge-order-robust), and
  *  2. end-to-end agreement: robust_sigma from the swapped plan within 2%
  *     of the exact plan (the decision any downstream outlier gate makes).
  *
  * The swap is literally a one-argument change to the percentile kernel —
  * the plan shape, shuffles, and broadcast are identical, which is the
  * point: at 100 TB the exact full-sort percentile becomes the bottleneck
  * and GK's constant-size-summary aggregation replaces it with no plan
  * restructuring.
  */
class GkSwapSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** q_mad's exact two-pass shape (operators/Aggregations.scala qMad),
    * parameterized by the percentile kernel. */
  private def madShape(df: DataFrame, pct: String => String): DataFrame = {
    val med = df.groupBy(col("g")).agg(expr(pct("x")).as("med"))
    df.join(broadcast(med), "g")
      .select(col("g"), col("med"), abs(col("x") - col("med")).as("dev"))
      .groupBy(col("g"), col("med"))
      .agg(expr(pct("dev")).as("mad"))
      .select(col("g"), col("med"), col("mad"),
        (col("mad") * lit(1.4826)).as("robust_sigma"))
  }

  test("GK sketch swaps into the q_mad two-pass shape within its rank-error bound") {
    import spark.implicits._
    // planted deterministic heavy-tailed distribution, 3 groups
    val df = spark.range(0, 150000).select(
      (col("id") % 3).cast("string").as("g"),
      (pow(col("id") % 1000 + 1, 1.5) + (col("id") % 7).cast("double")).as("x"))
    df.cache().count()
    val acc = 1000
    val exact = madShape(df, c => s"percentile($c, 0.5)")
    val gk = madShape(df, c => s"approx_percentile($c, 0.5, $acc)")

    // (1) rank guarantee, at 2x margin: GK median within exact [p498, p502]
    val bands = df.groupBy($"g").agg(
      expr("percentile(x, 0.498)").as("lo"),
      expr("percentile(x, 0.502)").as("hi"))
    gk.select($"g", $"med").join(bands, "g")
      .select($"g", $"med", $"lo", $"hi")
      .as[(String, Double, Double, Double)].collect()
      .foreach { case (g, med, lo, hi) =>
        assert(med >= lo && med <= hi,
          s"group $g: GK median $med outside exact rank band [$lo, $hi]")
      }

    // (2) end-to-end: swapped-plan robust sigma within 2% of exact
    val cmp = exact.select($"g", $"robust_sigma".as("rs_exact"))
      .join(gk.select($"g", $"robust_sigma".as("rs_gk")), "g")
      .as[(String, Double, Double)].collect()
    assert(cmp.length == 3)
    cmp.foreach { case (g, e, a) =>
      assert(math.abs(a - e) / e < 0.02,
        s"group $g: robust_sigma exact=$e gk=$a drifts > 2%")
    }
    df.unpersist()
  }
}
