package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._
import graft.sources.Lake

/** Partitioned-lake scans (SURVEY.md §2.B.1 / §4): the two plan levers
  * that dominate at 100 TB — static partition pruning (a month predicate
  * touches only its directories) and DYNAMIC partition pruning (a
  * filtered dimension prunes fact partitions at runtime through the join).
  * PlanSpec asserts both actually appear in the physical plan
  * (`PartitionFilters` / `dynamicpruningexpression`); the DuckDB oracle
  * reads the same directories with `hive_partitioning=true`.
  */
object Partitioned {

  /** Static partition pruning: a range predicate on the partition column
    * must reach `PartitionFilters` (listing only 1996's directories), not
    * a post-scan filter. At 100 TB this is the difference between reading
    * one year and reading the table. */
  val qScanPartitioned: GQuery = GQuery(
    "q_scan_partitioned",
    (spark, dir) => {
      val lake = Lake.ensureOrdersByMonth(spark, dir)
      spark.read.parquet(lake)
        .filter(col("o_month") >= "1996-01" && col("o_month") <= "1996-12")
        .groupBy(col("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_month"))
    },
    Some(s"""
      SELECT o_month, count(*) AS n_orders,
             ${dsumSql("o_totalprice")} AS total_price
      FROM ${Lake.ordersByMonthOracle}
      WHERE o_month >= '1996-01' AND o_month <= '1996-12'
      GROUP BY o_month
      ORDER BY o_month"""),
  )

  /** Dynamic partition pruning: the fact side is the partitioned lake, the
    * dim side is a data-dependent month dimension (months whose first
    * order key is even — a predicate NOT derivable from the join key, so
    * the optimizer cannot constant-fold it into a static filter). Spark
    * plants a DPP subquery on the fact scan that reuses the dim broadcast:
    * only the surviving months' directories are read. The dim broadcast is
    * scale-safe — its cardinality is bounded by the calendar, not the SF. */
  val qJoinDpp: GQuery = GQuery(
    "q_join_dpp",
    (spark, dir) => {
      val lake = Lake.ensureOrdersByMonth(spark, dir)
      val fact = spark.read.parquet(lake)
      val dim = Tables.orders(spark, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
        .agg(min(col("o_orderkey")).as("first_key"))
        .filter(col("first_key") % 2 === 0)
        .select(col("o_month"))
      fact.join(broadcast(dim), "o_month")
        .groupBy(col("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_month"))
    },
    Some(s"""
      WITH dim AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
               min(o_orderkey) AS first_key
        FROM orders GROUP BY 1)
      SELECT f.o_month, count(*) AS n_orders,
             ${dsumSql("f.o_totalprice")} AS total_price
      FROM ${Lake.ordersByMonthOracle} f
      JOIN dim ON f.o_month = dim.o_month
      WHERE dim.first_key % 2 = 0
      GROUP BY f.o_month
      ORDER BY f.o_month"""),
  )

  /** Z-order-clustered scan: a two-column range predicate over the
    * Morton-clustered events copy ([[Lake.ensureEventsZOrdered]]). Both
    * predicates are pushed to the parquet scan (`PushedFilters`), and
    * because every file is tight on BOTH user_id and value, footer stats
    * skip most files — where a single-column sort would only serve its
    * leading column. SourcesSpec measures the per-file range tightness;
    * this query puts the layout's read path under the oracle gate. */
  val qScanZOrder: GQuery = GQuery(
    "q_scan_zorder",
    (spark, dir) => {
      val z = Lake.ensureEventsZOrdered(spark, dir)
      spark.read.parquet(z)
        .filter(col("user_id").between(0, 9) &&
          col("value").between(10.0, 200.0))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value"), 6).as("total_value"),
          min(col("event_id")).as("min_event"),
          max(col("event_id")).as("max_event"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n_events,
             ${dsumSql("value", 6)} AS total_value,
             min(event_id) AS min_event, max(event_id) AS max_event
      FROM ${Lake.eventsZOrderOracle}
      WHERE user_id BETWEEN 0 AND 9 AND value BETWEEN 10.0 AND 200.0
      GROUP BY event_type
      ORDER BY event_type"""),
  )

  /** Co-located bucketed fact⋈fact join: both sides pre-bucketed 16 ways
    * on the join key ([[Lake.ensureBucketedFacts]]), so the sort-merge
    * join consumes bucket layout directly — NO Exchange feeds the join
    * (PlanSpec asserts it). The merge hint pins the plan the 100 TB
    * deployment would run (tiny test data would otherwise broadcast and
    * hide the layout win). The oracle reads the same parquet bytes — the
    * bucket metadata only changes the plan, never the rows. */
  val qJoinBucketed: GQuery = GQuery(
    "q_join_bucketed",
    (spark, dir) => {
      Lake.ensureBucketedFacts(spark, dir)
      spark.table("graft_li_bucketed").hint("merge")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""
      SELECT o_orderpriority, count(*) AS n_items,
             ${dsumSql("l_quantity")} AS sum_qty,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM ${Lake.bucketedLiOracle} li
      JOIN ${Lake.bucketedOrdOracle} o ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
  )

  /** SMALL-FILE COMPACTION PLANNER over the partitioned lake: per-file
    * row counts (metadata-scale, via the engine's own file attribution
    * — input_file_name here, read_parquet(filename=true) in the oracle,
    * both naming the SAME on-disk files) rolled into greedy
    * target-sized output bins: files in path order, bin boundary every
    * `target` cumulative rows. This is the maintenance query every
    * 100 TB lake runs nightly — the plan TELLS the rewrite job what to
    * coalesce; only file stats move, never data. The cumulative window
    * rides the |files|-bounded listing. */
  val qCompaction: GQuery = {
    val target = 25000L
    GQuery(
      "q_compaction",
      (spark, dir) => {
        import spark.implicits._
        val path = Lake.ensureOrdersByMonth(spark, dir)
        val files = spark.read.parquet(path)
          .select(regexp_extract(input_file_name(), "[^/]+/[^/]+$", 0)
            .as("file"))
          .groupBy($"file")
          .agg(count(lit(1)).as("n_rows"))
        val w = Window.orderBy($"file")
          .rowsBetween(Window.unboundedPreceding, -1)
        files
          .withColumn("cum_before", coalesce(sum($"n_rows").over(w), lit(0L)))
          .withColumn("bin", expr(s"cum_before div $target"))
          .groupBy($"bin")
          .agg(count(lit(1)).as("n_files"),
            sum($"n_rows").as("n_rows"),
            min($"file").as("first_file"))
          .withColumn("fill",
            r6($"n_rows".cast("double") / lit(target.toDouble)))
          .orderBy($"bin")
      },
      Some(s"""
      WITH files AS (
        SELECT regexp_extract(filename, '[^/]+/[^/]+$$', 0) AS file,
               count(*) AS n_rows
        FROM read_parquet('${Lake.ordersByMonthPath}/*/*.parquet',
               hive_partitioning=true, filename=true)
        GROUP BY 1),
      cum AS (
        SELECT file, n_rows,
               cast(coalesce(sum(n_rows) OVER (ORDER BY file
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 as bigint) AS cum_before
        FROM files)
      SELECT cum_before // $target AS bin,
             count(*) AS n_files,
             cast(sum(n_rows) as bigint) AS n_rows,
             min(file) AS first_file,
             ${r6Sql(s"cast(sum(n_rows) as double) / " +
               s"cast($target.0 as double)")} AS fill
      FROM cum
      GROUP BY 1 ORDER BY bin"""),
    )
  }

  val all: Seq[GQuery] = Seq(qScanPartitioned, qJoinDpp, qScanZOrder,
    qJoinBucketed, qCompaction)
}
