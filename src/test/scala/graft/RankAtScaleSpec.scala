package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executable 100-TB posture for the rank statistics (q_mannwhitney,
  * q_kruskal, q_ks_test, q_spearman, q_zipf): their raw pass collapses
  * the fact table to per-distinct-value counts, and the ONLY
  * unpartitioned window rides that collapsed table — safe while
  * |distinct values| is bounded, but a continuous measure's distinct
  * count grows with data. This spec proves the swap path: the same
  * cumulative-below-value prefix sum computed with a RANGE-PARTITIONED
  * two-pass plan — per-partition local prefix sums (parallel windows)
  * plus a P-row broadcast of partition offsets — is BIT-IDENTICAL to
  * the single-window form, on integer count arithmetic, so every
  * downstream statistic (U, H, D, ρ, the Zipf slope) is unchanged. The
  * swap is plan-shape only: no formula, oracle, or output changes, and
  * the collapsed table never serializes through one task.
  */
class RankAtScaleSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Single-window form used by the shipped queries: cumulative count
    * strictly below each distinct value. */
  private def cumBelowGlobal(g: DataFrame): DataFrame = {
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
  }

  /** Range-partitioned two-pass form: local prefix sums inside each of
    * P range partitions (windows run in parallel), then one P-row
    * offsets table (total count of every lower partition) broadcast
    * back. Integer adds in a different association — exact, so
    * bit-identical to the global window. */
  private def cumBelowRanged(g: DataFrame, parts: Int): DataFrame = {
    // localCheckpoint: both consumers below (local prefix window, offsets
    // table) must read ONE materialized range partitioning — if Catalyst
    // planned the branches as two separate range exchanges, each
    // RangePartitioner would sample its boundaries independently (seed
    // tied to RDD id) and the two branches' pids could disagree,
    // breaking the bit-identity contract flakily.
    val p = g.repartitionByRange(parts, col("v"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = p.withColumn("cum_in",
      coalesce(sum(col("c")).over(wLocal), lit(0L)))
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = p.groupBy(col("pid")).agg(sum(col("c")).as("pt"))
      .withColumn("off", coalesce(sum(col("pt")).over(wOff), lit(0L)))
      .select(col("pid"), col("off"))
    local.join(broadcast(offs), "pid")
      .withColumn("cum", col("off") + col("cum_in"))
      .drop("pid", "cum_in", "off")
  }

  test("ranged two-pass prefix sum is bit-identical to the global window") {
    import spark.implicits._
    // planted collapsed table: ~200k distinct non-monotonic values with
    // varying counts — the shape the rank statistics window over
    val g = spark.range(0, 200000).select(
      (pmod(col("id") * lit(2654435761L), lit(1000003L)).cast("double") /
        lit(7.0)).as("v"),
      (col("id") % 5 + 1).as("c"))
      .groupBy($"v").agg(sum($"c").as("c"))
    val exact = cumBelowGlobal(g).select($"v", $"cum".as("cum_g"))
    val ranged = cumBelowRanged(g, 16).select($"v", $"cum".as("cum_r"))
    val diff = exact.join(ranged, "v")
      .filter($"cum_g" =!= $"cum_r").count()
    assert(diff == 0L, s"$diff distinct values disagree between forms")
    // and the partitioned form really kept P parallel windows: the
    // local window is partitioned, so no single-task global sort
    val nDistinct = g.count()
    assert(exact.count() == nDistinct && ranged.count() == nDistinct)
  }

  test("q_mannwhitney's U and z are unchanged under the ranged rank path") {
    import spark.implicits._
    val o = graft.engine.Tables.orders(spark, "/root/testdata/sf0.001")
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select($"o_totalprice".as("v"), $"o_orderpriority".as("pri"))
    val g = o.groupBy($"v")
      .agg(sum(when($"pri" === "1-URGENT", 1L).otherwise(0L)).as("c1"),
        sum(when($"pri" === "5-LOW", 1L).otherwise(0L)).as("c2"))
    def stats(cum: DataFrame): (Long, Long, Long, Long) = {
      val r = cum.agg(
        sum($"c1").as("n1"), sum($"c2").as("n2"),
        sum($"c1" * (lit(2L) * $"cum" + $"c2")).as("u2"),
        sum(($"c1" + $"c2") * ($"c1" + $"c2") * ($"c1" + $"c2") -
          ($"c1" + $"c2")).as("ties3")).head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val viaGlobal = stats(cumBelowGlobal(g.withColumnRenamed("c2", "c"))
      .withColumnRenamed("c", "c2"))
    val viaRanged = stats(cumBelowRanged(g.withColumnRenamed("c2", "c"), 8)
      .withColumnRenamed("c", "c2"))
    assert(viaGlobal == viaRanged,
      s"U-statistic inputs diverge: $viaGlobal vs $viaRanged")
  }
}
