package graft.operators

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

  val all: Seq[GQuery] = Seq(qScanPartitioned, qJoinDpp)
}
