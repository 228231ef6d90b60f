package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val all: Seq[GQuery] = Seq(qPricing)
}
