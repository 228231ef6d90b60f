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

  /** q_lead_time's per-supplier percentile shape (operators/MetricOps
    * qLeadTime), parameterized by the percentile kernel — the other
    * exact-percentile-over-raw-fact-rows site (BENCH_r08 flagged it as
    * the memory-heavy ObjectHashAggregate magnifying contention). The
    * 100-TB swap is again one argument: GK's constant-size summary
    * replaces the hold-all-values exact kernel with the identical
    * join+groupBy plan. */
  private def leadShape(sf: String, pct: (String, Double) => String) = {
    import spark.implicits._
    graft.engine.Tables.lineitem(spark, sf)
      .join(graft.engine.Tables.orders(spark, sf),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey",
        datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
          .cast("long").as("days"))
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n"),
        expr(pct("days", 0.5)).as("p50"),
        expr(pct("days", 0.95)).as("p95"))
  }

  test("GK sketch swaps into the q_lead_time per-supplier shape within bounds") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val acc = 1000
    val gk = leadShape(sf, (c, p) => s"approx_percentile($c, $p, $acc)")
    // rank bands from the exact kernel at p ± 2/accuracy (2x margin)
    val bands = leadShape(sf, (c, p) => s"percentile($c, $p)")
    // GK returns an actual data value whose RANK is within eps*n of the
    // target — so the band must be true order statistics at rank offsets,
    // not interpolated quantiles (whose index convention differs by a
    // rank or two at small n). Value at rank k (ascending, 1-based) is
    // max(days | rk <= k); margin = max(3, 2*eps*n) ranks.
    val ranked = graft.engine.Tables.lineitem(spark, sf)
      .join(graft.engine.Tables.orders(spark, sf),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey",
        datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
          .cast("long").as("days"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"l_suppkey").orderBy($"days")))
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"l_suppkey")))
    val margin = greatest(lit(3L), ceil($"cnt" * lit(2.0) / acc).cast("long"))
    def bandAt(p: Double, name: String) = Seq(
      max(when($"rk" <= greatest(floor($"cnt" * p) - margin, lit(1L)),
        $"days")).as(s"lo$name"),
      min(when($"rk" >= least(ceil($"cnt" * p) + margin, $"cnt"),
        $"days")).as(s"hi$name"))
    val exactLoHi = ranked.groupBy($"l_suppkey")
      .agg((bandAt(0.5, "50") ++ bandAt(0.95, "95")).head,
        (bandAt(0.5, "50") ++ bandAt(0.95, "95")).tail: _*)
    val rows = gk.join(exactLoHi, "l_suppkey")
      .select($"l_suppkey", $"p50".cast("double"), $"p95".cast("double"),
        $"lo50".cast("double"), $"hi50".cast("double"), $"lo95".cast("double"), $"hi95".cast("double"))
      .as[(Long, Double, Double, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, p50, p95, lo50, hi50, lo95, hi95) =>
      assert(p50 >= lo50 && p50 <= hi50,
        s"supplier $s: GK p50 $p50 outside exact rank band [$lo50, $hi50]")
      assert(p95 >= lo95 && p95 <= hi95,
        s"supplier $s: GK p95 $p95 outside exact rank band [$lo95, $hi95]")
    }
    // end-to-end: the 10-slowest-by-p95 selection overlaps heavily
    val topExact = bands.orderBy($"p95".cast("double").desc, $"l_suppkey")
      .limit(10).select($"l_suppkey").as[Long].collect().toSet
    val topGk = gk.orderBy($"p95".cast("double").desc, $"l_suppkey")
      .limit(10).select($"l_suppkey").as[Long].collect().toSet
    assert((topExact intersect topGk).size >= 8,
      s"top-10 sets diverge: exact=$topExact gk=$topGk")
  }
}
