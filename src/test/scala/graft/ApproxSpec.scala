package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate sketches (SURVEY.md §2.B.4 ◻): not oracle-declarable
  * (sketch values differ engine to engine) — verified against exact
  * computations with tolerance instead. */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact on order keys") {
    import spark.implicits._
    val o = graft.engine.Tables.orders(spark, sf)
    val (approx, exact) = o.agg(
      approx_count_distinct($"o_custkey", 0.02).as("a"),
      countDistinct($"o_custkey").as("e"))
      .as[(Long, Long)].head()
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.05, s"HLL err $err (approx=$approx exact=$exact)")
  }

  test("percentile_approx close to exact percentile on quantities") {
    import spark.implicits._
    val li = graft.engine.Tables.lineitem(spark, sf)
    val (approx, exact) = li.agg(
      percentile_approx($"l_quantity", lit(0.5), lit(10000)).as("a"),
      expr("percentile(l_quantity, 0.5)").as("e"))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) <= 1.0,
      s"approx median $approx vs exact $exact")
  }

  test("q_approx_pctl per-group sketch percentiles within 2% of exact") {
    import spark.implicits._
    val rows = graft.operators.ScaleOps.qApproxPctl.run(spark, sf)
      .join(
        graft.engine.Tables.lineitem(spark, sf)
          .groupBy($"l_returnflag")
          .agg(expr("percentile(l_extendedprice, 0.5)").as("e50"),
            expr("percentile(l_extendedprice, 0.99)").as("e99")),
        "l_returnflag")
      .select($"p50_price", $"e50", $"p99_price", $"e99")
      .as[(Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a50, e50, a99, e99) =>
      assert(math.abs(a50 - e50) / e50 < 0.02, s"p50 $a50 vs $e50")
      assert(math.abs(a99 - e99) / e99 < 0.02, s"p99 $a99 vs $e99")
    }
  }
}
