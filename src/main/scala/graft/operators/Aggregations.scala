package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Aggregation operators (SURVEY.md §2.B.4): partial+final hash aggregation,
  * distinct aggregates, rollup/cube grouping sets, percentiles, ordered
  * array_agg. All are map-side-combinable (`HashAggregateExec` partial →
  * shuffle on group keys → final), so they scale linearly with input: at
  * 100 TB the shuffle carries only |groups| × width bytes, not the input.
  */
object Aggregations {

  /** Flagship — TPC-H Q1 "pricing summary report" shape over lineitem.
    * 6 groups out of 600k+ rows: the shuffle is ~6 rows per partition.
    */
  val qPricing: GQuery = GQuery(
    "q_pricing",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"))
            .as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base_price,
        ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        ${dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
        ${davgSql("l_quantity")} AS avg_qty,
        ${davgSql("l_extendedprice")} AS avg_price,
        ${davgSql("l_discount")} AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
  )

  /** Distinct aggregates — Spark plans these as a double-shuffle expand;
    * still map-side combinable on the distinct keys. */
  val qAggDistinct: GQuery = GQuery(
    "q_agg_distinct",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct($"o_custkey").as("n_customers"),
          countDistinct($"o_orderstatus").as("n_statuses"),
          dsum($"o_totalprice").as("total_price"))
        .orderBy($"o_orderpriority")
    },
    Some(s"""
      SELECT o_orderpriority, count(*) AS n_orders,
             count(DISTINCT o_custkey) AS n_customers,
             count(DISTINCT o_orderstatus) AS n_statuses,
             ${dsumSql("o_totalprice")} AS total_price
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
  )

  /** ROLLUP grouping sets with grouping_id; null group keys coalesced to
    * 'ALL' on both sides so the hash compare is null-free. */
  val qRollup: GQuery = GQuery(
    "q_rollup",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_items"),
          dsum($"l_quantity").as("sum_qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"gid", $"n_items", $"sum_qty")
        .orderBy($"gid", $"returnflag", $"linestatus")
    },
    Some(s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             cast(grouping_id(l_returnflag, l_linestatus) as bigint) AS gid,
             count(*) AS n_items,
             ${dsumSql("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY gid, returnflag, linestatus"""),
  )

  /** CUBE over two order dimensions. */
  val qCube: GQuery = GQuery(
    "q_cube",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_orders"),
          dsum($"o_totalprice").as("total_price"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"gid", $"n_orders", $"total_price")
        .orderBy($"gid", $"status", $"priority")
    },
    Some(s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             cast(grouping_id(o_orderstatus, o_orderpriority) as bigint) AS gid,
             count(*) AS n_orders,
             ${dsumSql("o_totalprice")} AS total_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, status, priority"""),
  )

  /** Exact percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`,
    * linear interpolation). The approx variant (`percentile_approx`/HLL)
    * is unit-tested instead — approx sketches can't hash-match. */
  val qPercentile: GQuery = GQuery(
    "q_percentile",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
          round(expr("percentile(l_quantity, 0.95)"), 6).as("p95"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.25), 6) AS p25,
             round(quantile_cont(l_quantity, 0.5), 6) AS p50,
             round(quantile_cont(l_quantity, 0.75), 6) AS p75,
             round(quantile_cont(l_quantity, 0.95), 6) AS p95
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  /** Order-sensitive array agg, made deterministic with array_sort
    * (§5.2 rule 4). */
  val qArrayAgg: GQuery = GQuery(
    "q_arrayagg",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .filter($"l_orderkey" <= 500)
        .groupBy($"l_orderkey")
        .agg(
          // numeric sort first, then stringify + join: the driver's compare
          // harness can't hash list cells, so array outputs ship as a
          // deterministic comma-joined scalar (ADVICE r1).
          array_join(
            transform(array_sort(collect_list($"l_partkey")), _.cast("string")),
            ",").as("partkeys"),
          count(lit(1)).as("n_items"))
        .orderBy($"l_orderkey")
    },
    Some("""
      SELECT l_orderkey,
             array_to_string(list_sort(list(l_partkey)), ',') AS partkeys,
             count(*) AS n_items
      FROM lineitem WHERE l_orderkey <= 500
      GROUP BY l_orderkey ORDER BY l_orderkey"""),
  )

  /** Pivot: event counts per user × event_type. Spark's `pivot()` with an
    * explicit value list (no extra pass to discover values — required at
    * scale); the oracle expresses the same thing with FILTERed counts. */
  val qPivot: GQuery = GQuery(
    "q_pivot",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id,
        count(*) FILTER (WHERE event_type = 'click') AS click,
        count(*) FILTER (WHERE event_type = 'view') AS view,
        count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        count(*) FILTER (WHERE event_type = 'signup') AS signup,
        count(*) FILTER (WHERE event_type = 'error') AS error
      FROM events GROUP BY user_id ORDER BY user_id"""),
  )

  /** Ordered string aggregation (listagg/string_agg): region name list
    * per... nation names per region, sorted for determinism. */
  val qStringAgg: GQuery = GQuery(
    "q_stringagg",
    (spark, dir) => {
      import spark.implicits._
      Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(
          concat_ws(",", array_sort(collect_list($"n_name"))).as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy($"r_name")
    },
    Some("""
      SELECT r_name,
             string_agg(n_name, ',' ORDER BY n_name) AS nations,
             count(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""),
  )

  /** Conditional/boolean aggregates: count_if + bool_and/bool_or (with
    * FILTER-clause twins already exercised by q_pivot's oracle). */
  val qAggBool: GQuery = GQuery(
    "q_agg_bool",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .groupBy($"o_orderstatus")
        .agg(
          expr("count_if(o_totalprice > 100000)").as("n_big"),
          expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
          expr("bool_and(o_totalprice > 0)").as("all_positive"),
          expr("count_if(o_custkey % 2 = 0)").as("n_even_cust"))
        .orderBy($"o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus,
        count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        bool_and(o_totalprice > 0) AS all_positive,
        count(*) FILTER (WHERE o_custkey % 2 = 0) AS n_even_cust
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
  )

  /** Statistical moment family — stddev / variance / covariance /
    * correlation. Native stddev/corr accumulate doubles in shuffle-merge
    * order (nondeterministic on a cluster) and DuckDB's kernels use a
    * different update order, so we compute the moments as EXACT decimal
    * sums (order-free) and finish with identical scalar IEEE arithmetic —
    * deterministic on 1 core or 1000 executors.
    */
  val qAggStats: GQuery = GQuery(
    "q_agg_stats",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(30, 6)
      val x = $"l_quantity".cast(dec)
      val y = $"l_extendedprice".cast(dec)
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"),
          sum(x * x).cast("double").as("sxx"),
          sum(y).cast("double").as("sy"),
          sum(y * y).cast("double").as("syy"),
          sum(x * y).cast("double").as("sxy"))
        .select(
          $"l_returnflag", $"n",
          r6(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1)).as("var_qty"),
          r6(sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1))).as("std_qty"),
          r6(($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - 1)).as("covar_qp"),
          r6(($"n" * $"sxy" - $"sx" * $"sy") /
            sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
                 ($"n" * $"syy" - $"sy" * $"sy"))).as("corr_qp"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag, n,
        ${rNSql("(sxx - sx*sx/n) / (n-1)", 6)} AS var_qty,
        ${rNSql("sqrt((sxx - sx*sx/n) / (n-1))", 6)} AS std_qty,
        ${rNSql("(sxy - sx*sy/n) / (n-1)", 6)} AS covar_qp,
        ${rNSql("(n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))", 6)}
          AS corr_qp
      FROM (
        SELECT l_returnflag, count(*) AS n,
          cast(sum(x) as double) AS sx, cast(sum(x*x) as double) AS sxx,
          cast(sum(y) as double) AS sy, cast(sum(y*y) as double) AS syy,
          cast(sum(x*y) as double) AS sxy
        FROM (SELECT l_returnflag,
                cast(l_quantity as decimal(30,6)) AS x,
                cast(l_extendedprice as decimal(30,6)) AS y
              FROM lineitem) t
        GROUP BY l_returnflag) m
      ORDER BY l_returnflag"""),
  )

  /** Explicit GROUPING SETS (beyond rollup/cube): Spark plans one Expand +
    * one hash-agg pass, so the shuffle carries |sets| × |groups| rows —
    * cheaper than unioning three separate aggregations at scale. */
  val qGroupingSets: GQuery = GQuery(
    "q_grouping_sets",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .groupingSets(
          Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"), Seq()),
          $"l_returnflag", $"l_linestatus")
        .agg(
          grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          dsum($"l_quantity").as("sum_qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"gid", $"n", $"sum_qty")
        .orderBy($"gid", $"returnflag", $"linestatus")
    },
    Some(s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             cast(grouping_id(l_returnflag, l_linestatus) as int) AS gid,
             count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY gid, returnflag, linestatus"""),
  )

  /** WEIGHTED MEDIAN of line-item quantity, weighted by extended price —
    * "the quantity at which half the REVENUE sits", the robust center
    * the unweighted median misses when big orders skew value. Fully
    * integer: weights are exact cents, the fact collapses to per-
    * (flag, qty) weight sums first (combinable — the only full pass),
    * the cumulative ride is over ≤50 distinct quantities per flag, and
    * the median pick is the integer test 2·cum ≥ total (no total/2
    * division to round). Ties impossible to mis-order: qty is the
    * window's total order within flag. */
  val qWeightedMedian: GQuery = GQuery(
    "q_weighted_median",
    (spark, dir) => {
      import spark.implicits._
      val w = floor($"l_extendedprice" * lit(100.0) + lit(0.5)).cast("long")
      val g = Tables.lineitem(spark, dir)
        .select($"l_returnflag", $"l_quantity", w.as("w"))
        .groupBy($"l_returnflag", $"l_quantity")
        .agg(sum($"w").as("ws"))
      val wc = Window.partitionBy($"l_returnflag").orderBy($"l_quantity")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wa = Window.partitionBy($"l_returnflag")
      g.withColumn("cum", sum($"ws").over(wc))
        .withColumn("tot", sum($"ws").over(wa))
        .filter(lit(2L) * $"cum" >= $"tot")
        .groupBy($"l_returnflag")
        .agg(min($"l_quantity").as("weighted_median_qty"),
          r2(max($"tot").cast("double") / lit(100.0)).as("total_revenue"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      WITH g AS (
        SELECT l_returnflag, l_quantity,
               cast(sum(cast(floor(l_extendedprice * cast(100.0 as double)
                 + cast(0.5 as double)) as bigint)) as bigint) AS ws
        FROM lineitem GROUP BY 1, 2),
      c AS (
        SELECT l_returnflag, l_quantity,
               cast(sum(ws) OVER (PARTITION BY l_returnflag
                 ORDER BY l_quantity
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 as bigint) AS cum,
               cast(sum(ws) OVER (PARTITION BY l_returnflag) as bigint)
                 AS tot
        FROM g)
      SELECT l_returnflag,
             min(l_quantity) AS weighted_median_qty,
             ${r2Sql("cast(max(tot) as double) / cast(100.0 as double)")}
               AS total_revenue
      FROM c WHERE 2 * cum >= tot
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  /** MODE (most frequent value) per group — the categorical central
    * tendency, built from counts + a rank-1 window rather than the
    * engines' native mode() (whose tie-breaking is implementation-
    * defined in BOTH Spark and DuckDB; here ties break deterministically
    * toward the SMALLEST value). One combinable count pass over the
    * fact; the argmax window runs over ≤|distinct values| rows per
    * group. */
  val qAggMode: GQuery = GQuery(
    "q_agg_mode",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag", $"l_quantity")
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"l_returnflag")
            .orderBy($"n".desc, $"l_quantity")))
        .filter($"rk" === 1)
        .select($"l_returnflag", $"l_quantity".as("mode_qty"),
          $"n".as("n_occurrences"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag, l_quantity AS mode_qty,
             cast(n as bigint) AS n_occurrences
      FROM (
        SELECT l_returnflag, l_quantity, count(*) AS n,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY count(*) DESC, l_quantity) AS rk
        FROM lineitem GROUP BY l_returnflag, l_quantity) t
      WHERE rk = 1 ORDER BY l_returnflag"""),
  )

  /** min_by / max_by (arg-extrema): who holds the largest / smallest
    * account balance per nation. The struct second argument gives a total
    * order (balance, then custkey) so ties are deterministic; DuckDB 1.0's
    * arg_max can't take a composite key, so the oracle expresses the same
    * semantics with rank-1 windows. One hash-agg pass, map-side combinable
    * (min_by/max_by partials merge associatively — scales like min/max).
    */
  val qMinmaxBy: GQuery = GQuery(
    "q_minmax_by",
    (spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir)
        .groupBy($"c_nationkey")
        .agg(
          max_by($"c_custkey", struct($"c_acctbal", $"c_custkey")).as("richest"),
          min_by($"c_custkey", struct($"c_acctbal", $"c_custkey")).as("poorest"),
          max($"c_acctbal").as("max_bal"),
          min($"c_acctbal").as("min_bal"))
        .orderBy($"c_nationkey")
    },
    Some("""
      SELECT c_nationkey,
        max(CASE WHEN rmax = 1 THEN c_custkey END) AS richest,
        max(CASE WHEN rmin = 1 THEN c_custkey END) AS poorest,
        max(c_acctbal) AS max_bal, min(c_acctbal) AS min_bal
      FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
          row_number() OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
          row_number() OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
        FROM customer) t
      GROUP BY c_nationkey ORDER BY c_nationkey"""),
  )

  /** Fixed-width histogram of events.value — floor(x/w) binning is pure
    * IEEE arithmetic (identical bits both engines); min/max pass raw values
    * through unrounded. The classic profiling scan: one pass, |bins| output
    * rows regardless of input size. */
  val qHistogram: GQuery = GQuery(
    "q_histogram",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy(floor($"value" / 10.0).cast("int").as("bin"))
        .agg(
          count(lit(1)).as("n"),
          min($"value").as("min_v"),
          max($"value").as("max_v"),
          davg($"value").as("avg_v"))
        .orderBy($"bin")
    },
    Some(s"""
      SELECT cast(floor(value / 10.0) as int) AS bin, count(*) AS n,
        min(value) AS min_v, max(value) AS max_v,
        ${davgSql("value")} AS avg_v
      FROM events GROUP BY 1 ORDER BY bin"""),
  )

  /** Skew-resistant two-phase salted aggregation, DECLARED (the technique
    * graft.engine.Skew provides as a utility, here under the oracle gate):
    * phase 1 aggregates by (group, salt) spreading a hot key over 8
    * partitions; phase 2 merges the partials. Partials are exact decimals,
    * so the result is bit-identical to the unsalted plan the oracle runs —
    * the whole point: salting changes the shuffle layout, never the answer.
    */
  val qAggSalted: GQuery = GQuery(
    "q_agg_salted",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.types.DecimalType
      Tables.lineitem(spark, dir)
        .withColumn("salt", pmod($"l_orderkey", lit(8)))
        .groupBy($"l_returnflag", $"salt")
        .agg(
          sum($"l_quantity".cast(DecimalType(30, 6))).as("psum"),
          count(lit(1)).as("pn"))
        .groupBy($"l_returnflag")
        .agg(
          rN(sum($"psum").cast("double"), 2).as("sum_qty"),
          sum($"pn").as("n"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag, ${dsumSql("l_quantity")} AS sum_qty,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  /** Data-profiling scan (the quality gate before any pipeline run):
    * per-column non-null and distinct counts plus range bounds, one pass,
    * one output row. `count(DISTINCT a), count(DISTINCT b)` in one agg
    * plans as Expand — still a single scan of the fact table. */
  val qNullProfile: GQuery = GQuery(
    "q_null_profile",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .agg(
          count(lit(1)).as("n_rows"),
          count($"o_orderstatus").as("nn_status"),
          countDistinct($"o_orderstatus").as("nd_status"),
          count($"o_orderpriority").as("nn_priority"),
          countDistinct($"o_orderpriority").as("nd_priority"),
          count($"o_totalprice").as("nn_price"),
          min($"o_totalprice").as("min_price"),
          max($"o_totalprice").as("max_price"),
          min($"o_orderdate").as("min_date"),
          max($"o_orderdate").as("max_date"))
    },
    Some("""
      SELECT count(*) AS n_rows,
        count(o_orderstatus) AS nn_status,
        count(DISTINCT o_orderstatus) AS nd_status,
        count(o_orderpriority) AS nn_priority,
        count(DISTINCT o_orderpriority) AS nd_priority,
        count(o_totalprice) AS nn_price,
        min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
      FROM orders"""),
  )

  /** IQR outlier detection (Tukey fences): per-group p25/p75 → broadcast
    * the tiny per-group bound table back onto the fact → count rows
    * outside [p25 − 1.5·IQR, p75 + 1.5·IQR]. Two passes over the fact
    * (percentile agg, then flag+count) — the exact-percentile pass is the
    * unavoidable cost; at 100 TB swap `percentile` for the GK sketch
    * (q_approx_pctl) and the second pass is unchanged. The fences are
    * computed from 6dp-rounded quantiles with exact-in-binary factors
    * (1.5), so both engines compare against identical doubles. */
  val qOutlier: GQuery = GQuery(
    "q_outlier",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
      val bounds = li.groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75"))
        .select($"l_returnflag",
          ($"p25" - lit(1.5) * ($"p75" - $"p25")).as("lo"),
          ($"p75" + lit(1.5) * ($"p75" - $"p25")).as("hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when($"l_extendedprice" < $"lo" || $"l_extendedprice" > $"hi", 1L)
            .otherwise(0L)).as("n_outliers"))
        .select($"l_returnflag", $"n_rows", $"n_outliers",
          r6($"n_outliers".cast("double") / $"n_rows".cast("double"))
            .as("outlier_rate"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      WITH bounds AS (
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25), 6)
                 - cast(1.5 as double)
                 * (round(quantile_cont(l_extendedprice, 0.75), 6)
                    - round(quantile_cont(l_extendedprice, 0.25), 6)) AS lo,
               round(quantile_cont(l_extendedprice, 0.75), 6)
                 + cast(1.5 as double)
                 * (round(quantile_cont(l_extendedprice, 0.75), 6)
                    - round(quantile_cont(l_extendedprice, 0.25), 6)) AS hi
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, count(*) AS n_rows,
             cast(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
                      THEN 1 ELSE 0 END) as bigint) AS n_outliers,
             ${r6Sql("cast(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi THEN 1 ELSE 0 END) as double) / cast(count(*) as double)")}
               AS outlier_rate
      FROM lineitem JOIN bounds USING (l_returnflag)
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  /** Robust dispersion: median absolute deviation (MAD) and the derived
    * robust sigma (1.4826·MAD) per group — the outlier-resistant
    * alternative to stddev (q_agg_stats). Structurally it is a
    * re-aggregation of a COMPUTED column: pass 1 finds the per-group
    * median, broadcasts the tiny result back onto the fact, pass 2 takes
    * the median of |x − med|. Same two-scan shape as q_outlier; at 100 TB
    * both percentile passes swap to the GK sketch unchanged — PROVEN by
    * GkSwapSpec, which runs this exact two-pass shape with the kernel
    * swapped percentile↔approx_percentile and bounds the drift to GK's
    * rank-error guarantee. */
  val qMad: GQuery = GQuery(
    "q_mad",
    (spark, dir) => {
      import spark.implicits._
      // r15 A/B: a project+repartition before the percentile passes (the
      // q_corr_matrix one-core-scan fix) measured NEUTRAL here (1.63 s
      // both ways) — the count-map partial agg is cheap enough that the
      // extra exchange buys nothing. Left in the original shape.
      val li = Tables.lineitem(spark, dir)
      val med = li.groupBy($"l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6).as("med"))
      li.join(broadcast(med), "l_returnflag")
        .select($"l_returnflag", $"med",
          abs($"l_extendedprice" - $"med").as("dev"))
        .groupBy($"l_returnflag", $"med")
        .agg(round(expr("percentile(dev, 0.5)"), 6).as("mad"))
        .select($"l_returnflag", $"med", $"mad",
          r6($"mad" * lit(1.4826)).as("robust_sigma"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      WITH med AS (
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS med
        FROM lineitem GROUP BY l_returnflag),
      dev AS (
        SELECT l.l_returnflag, med,
               abs(l.l_extendedprice - med) AS dev
        FROM lineitem l JOIN med USING (l_returnflag)),
      mad AS (
        SELECT l_returnflag, med,
               round(quantile_cont(dev, 0.5), 6) AS mad
        FROM dev GROUP BY l_returnflag, med)
      SELECT l_returnflag, med, mad,
             ${r6Sql("mad * cast(1.4826 as double)")} AS robust_sigma
      FROM mad ORDER BY l_returnflag"""),
  )

  val all: Seq[GQuery] =
    Seq(qPricing, qAggDistinct, qRollup, qCube, qPercentile, qArrayAgg,
      qPivot, qStringAgg, qAggBool, qAggStats, qGroupingSets, qMinmaxBy,
      qHistogram, qAggSalted, qNullProfile, qOutlier, qMad,
      qWeightedMedian, qAggMode)
}
