package graft.operators

import org.apache.spark.sql.functions._
import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Scan / projection / filter / conditional operators (SURVEY.md §2.B.1-B.2).
  * These exist to prove the scan path is right at scale: Catalyst pushes the
  * predicates into the parquet reader (PushedFilters) and prunes the read
  * schema to the projected columns — at 100 TB that is the difference
  * between scanning terabytes and scanning the few column chunks needed.
  */
object Scans {

  /** Full-scan count + exact sum: the cheapest possible pass over the fact
    * table (count-star + one pruned column). */
  val qScan: GQuery = GQuery(
    "q_scan",
    (spark, dir) =>
      Tables.lineitem(spark, dir).agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("total_price")),
    Some(s"""
      SELECT count(*) AS n_rows, ${dsumSql("l_extendedprice")} AS total_price
      FROM lineitem"""),
  )

  /** Projection with per-row arithmetic; column pruning should reduce the
    * scan to 5 of 11 lineitem columns. */
  val qProject: GQuery = GQuery(
    "q_project",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .select(
          $"l_orderkey", $"l_linenumber",
          r2($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
          r2($"l_quantity" * lit(0.5)).as("half_qty"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue,
        floor((l_quantity * 0.5) * 100 + 0.5) / 100 AS half_qty
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber"""),
  )

  /** Conjunctive/disjunctive predicates, IN, BETWEEN, LIKE — all pushed to
    * the parquet scan. */
  val qFilter: GQuery = GQuery(
    "q_filter",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .filter(
          $"o_orderstatus".isin("F", "P") &&
          $"o_totalprice".between(50000.0, 200000.0) &&
          ($"o_orderpriority".like("1-%") || $"o_orderpriority".like("2-%")))
        .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("o_totalprice"),
          $"o_orderstatus", $"o_orderpriority")
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
             o_orderstatus, o_orderpriority
      FROM orders
      WHERE o_orderstatus IN ('F','P')
        AND o_totalprice BETWEEN 50000.0 AND 200000.0
        AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      ORDER BY o_orderkey"""),
  )

  /** CASE WHEN tiers + coalesce/nullif (B.2 conditional family). */
  val qCase: GQuery = GQuery(
    "q_case",
    (spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir)
        .select(
          $"c_custkey",
          when($"c_acctbal" < 0, "overdrawn")
            .when($"c_acctbal" < 3000, "low")
            .when($"c_acctbal" < 7000, "mid")
            .otherwise("high").as("balance_tier"),
          coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("OTHER"))
            .as("segment_masked"),
          round(greatest($"c_acctbal", lit(0.0)), 2).as("pos_bal"))
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey,
        CASE WHEN c_acctbal < 0 THEN 'overdrawn'
             WHEN c_acctbal < 3000 THEN 'low'
             WHEN c_acctbal < 7000 THEN 'mid'
             ELSE 'high' END AS balance_tier,
        coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
        round(greatest(c_acctbal, 0.0), 2) AS pos_bal
      FROM customer
      ORDER BY c_custkey"""),
  )

  /** Cast matrix over the portable conversions (B.7 conditional/cast):
    * int↔string, string→double, timestamp→date, int→decimal→double.
    * (double→string and timestamp→string formatting differ between
    * engines and are deliberately excluded.) */
  val qCast: GQuery = GQuery(
    "q_cast",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .select(
          $"o_orderkey",
          $"o_orderkey".cast("string").as("key_str"),
          $"o_orderkey".cast("string").cast("long").as("key_roundtrip"),
          substring($"o_orderpriority", 1, 1).cast("int").as("priority_num"),
          to_date($"o_orderdate").as("order_date"),
          $"o_custkey".cast("decimal(18,2)").cast("double").as("cust_dec"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        cast(o_orderkey as varchar) AS key_str,
        cast(cast(o_orderkey as varchar) as bigint) AS key_roundtrip,
        cast(substring(o_orderpriority, 1, 1) as int) AS priority_num,
        cast(o_orderdate as date) AS order_date,
        cast(cast(o_custkey as decimal(18,2)) as double) AS cust_dec
      FROM orders ORDER BY o_orderkey"""),
  )

  /** Deterministic hash sampling — the reproducible cousin of
    * `df.sample()`: a multiplicative integer hash of the primary key taken
    * mod 1000 keeps ~5% of rows, bit-identically on any engine, any
    * partitioning, any cluster size (Bernoulli `sample()` depends on seed +
    * partition layout, useless for a cross-engine contract or a re-runnable
    * 100 TB pipeline). The filter is codegen'd and pushes nothing to the
    * driver; downstream agg verifies the sampled multiset. */
  val qSample: GQuery = GQuery(
    "q_sample",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .filter(($"l_orderkey" * 2654435761L + $"l_linenumber" * 97L) % 1000 < 50)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_sampled"), dsum($"l_extendedprice").as("sum_price"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag, count(*) AS n_sampled,
             ${dsumSql("l_extendedprice")} AS sum_price
      FROM lineitem
      WHERE (l_orderkey * 2654435761 + l_linenumber * 97) % 1000 < 50
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  /** UNPIVOT (wide → long reshape): three lineitem measures melt into
    * (measure, val) rows. Spark's `unpivot` plans an Expand — n_measures
    * output rows per input row, no shuffle, no driver involvement — the
    * scalable way to normalize metric columns for a feature store. */
  val qUnpivot: GQuery = GQuery(
    "q_unpivot",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .filter($"l_orderkey" <= 200)
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"l_quantity", $"l_discount", $"l_tax"),
          "measure", "val")
        // (l_orderkey, l_linenumber) is NOT unique in the testdata, so the
        // sort includes val to stay total (§5.2 tiebreak rule)
        .orderBy($"l_orderkey", $"l_linenumber", $"measure", $"val")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, measure, val FROM (
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        FROM lineitem WHERE l_orderkey <= 200)
      UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax))
      ORDER BY l_orderkey, l_linenumber, measure, val"""),
  )

  /** Deterministic WEIGHTED sampling (Efraimidis–Spirakis A-ES): each row
    * gets key ln(u)/w from a uniform u derived by the same multiplicative
    * hash as q_sample, and the global top-k by key IS a weighted sample
    * without replacement — reproducible on any partitioning, unlike any
    * rand()-based scheme. Here w = o_totalprice, so high-value orders are
    * oversampled. Plans as TakeOrderedAndProject: per-partition top-k then
    * a k-row merge on the driver side of the exchange — no global sort at
    * any scale. Cross-engine ln() bit-agreement is the same contract
    * q_tfidf/q_entropy already rely on. */
  val qSampleWeighted: GQuery = GQuery(
    "q_sample_weighted",
    (spark, dir) => {
      import spark.implicits._
      val u = (($"o_orderkey" % 1000000007L) * 2654435761L % 1000000007L + 1L)
        .cast("double") / 1000000008.0
      Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_totalprice",
          (log(u) / $"o_totalprice").as("es_key"))
        .orderBy($"es_key".desc, $"o_orderkey")
        .limit(25)
        .select($"o_orderkey", r2($"o_totalprice").as("o_totalprice"),
          r6($"es_key" * 1e6).as("es_key_x1e6"))
    },
    Some(s"""
      SELECT o_orderkey, ${r2Sql("o_totalprice")} AS o_totalprice,
             ${r6Sql("es_key * 1e6")} AS es_key_x1e6
      FROM (
        SELECT o_orderkey, o_totalprice,
               ln(cast((o_orderkey % 1000000007) * 2654435761 % 1000000007 + 1
                       as double) / 1000000008.0) / o_totalprice AS es_key
        FROM orders
        ORDER BY es_key DESC, o_orderkey
        LIMIT 25) s"""),
  )

  val all: Seq[GQuery] =
    Seq(qScan, qProject, qFilter, qCase, qCast, qSample, qUnpivot,
      qSampleWeighted)
}
