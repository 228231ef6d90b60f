package graft.operators

import org.apache.spark.sql.functions._
import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** The remaining TPC-H plan shapes (SURVEY.md §2.B.3 continuation, round
  * 6): Q2, Q6, Q7, Q9, Q10, Q11, Q12, Q13, Q14, Q15, Q19, Q20, Q21, Q22
  * — adapted to this schema (no partsupp / shipmode / phone /
  * commit-receipt dates; each scaladoc names the stand-in — Q2/Q11/Q20
  * derive their partsupp-like relation by aggregating lineitem per
  * (part, supplier)). Together with q_pricing (Q1), q_join_smj (Q3),
  * q_join_q4/q5/q8/q16/q17/q18 and the subquery family, ALL 22 TPC-H
  * queries now have declared, oracle-checked twins. Posture follows
  * Joins.scala: constant-size dims broadcast, SF-growing tables
  * un-hinted (stats/AQE decide), fact⋈fact shuffled, disjunctions
  * hand-factored into pushable bounds.
  */
object TpchShapes {

  /** TPC-H Q7 shape — volume shipping between two nations, both
    * directions, by ship year. The two-nation predicate is applied to
    * customer and supplier BEFORE the fact joins (each side shrinks to
    * ~2/25 of its table first), and the direction disjunction runs on
    * the two tiny attached name columns after. Nation is a 25-row
    * broadcast; customer/supplier stay un-hinted. */
  val qJoinQ7: GQuery = GQuery(
    "q_join_q7",
    (spark, dir) => {
      import spark.implicits._
      val nations = Seq("NATION_3", "NATION_8")
      val n = Tables.nation(spark, dir).filter($"n_name".isin(nations: _*))
      val cust = Tables.customer(spark, dir)
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"n_name".as("cust_nation"))
      val sup = Tables.supplier(spark, dir)
        .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      val li = Tables.lineitem(spark, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp_ntz"))
      li.join(Tables.orders(spark, dir).hint("shuffle_hash"),
          $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_8") ||
          ($"supp_nation" === "NATION_8" && $"cust_nation" === "NATION_3"))
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("int").as("l_year"))
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    },
    Some(s"""
      SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
             cast(year(l_shipdate) as int) AS l_year,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND ((n2.n_name = 'NATION_3' AND n1.n_name = 'NATION_8')
          OR (n2.n_name = 'NATION_8' AND n1.n_name = 'NATION_3'))
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""),
  )

  /** TPC-H Q9 shape — product-line profit by supplier nation and order
    * year. No partsupp here, so unit cost is a retail-price fraction
    * (0.4 * p_retailprice stands in for ps_supplycost); profit =
    * revenue - cost*qty, decimal-summed as ONE expression so both
    * engines accumulate the identical per-row double. The p_name slice
    * prunes part before the join; supplier attaches the 25-row nation
    * broadcast; everything SF-growing stays un-hinted. */
  val qJoinQ9: GQuery = GQuery(
    "q_join_q9",
    (spark, dir) => {
      import spark.implicits._
      val pt = Tables.part(spark, dir).filter($"p_name".like("%red%"))
        .select($"p_partkey", $"p_retailprice")
      val sup = Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name")
      val profit = $"l_extendedprice" * (lit(1) - $"l_discount") -
        lit(0.4) * $"p_retailprice" * $"l_quantity"
      Tables.lineitem(spark, dir)
        .join(pt, $"l_partkey" === $"p_partkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .join(Tables.orders(spark, dir).hint("shuffle_hash"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"n_name", year($"o_orderdate").cast("int").as("o_year"))
        .agg(dsum(profit).as("sum_profit"))
        .orderBy($"n_name", $"o_year".desc)
    },
    Some(s"""
      SELECT n_name, cast(year(o_orderdate) as int) AS o_year,
             ${dsumSql("l_extendedprice * (1 - l_discount) - " +
               "cast(0.4 as double) * p_retailprice * l_quantity")}
               AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
      GROUP BY n_name, o_year
      ORDER BY n_name, o_year DESC"""),
  )

  /** TPC-H Q10 shape — returned-item reporting: the 20 customers who
    * returned the most revenue in one quarter. The orderdate window
    * prunes orders before the fact join; the returnflag prunes lineitem
    * at the scan; TakeOrderedAndProject keeps the top 20 with no global
    * sort. Customer attributes ride the groupBy key (one shuffle). */
  val qJoinQ10: GQuery = GQuery(
    "q_join_q10",
    (spark, dir) => {
      import spark.implicits._
      val ord = Tables.orders(spark, dir)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"o_orderdate" < lit("1996-04-01").cast("timestamp_ntz"))
      val li = Tables.lineitem(spark, dir).filter($"l_returnflag" === "R")
      li.join(ord.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(spark, dir)),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },
    Some(s"""
      SELECT c_custkey, c_name, c_acctbal, n_name,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20"""),
  )

  /** TPC-H Q12 shape — priority mix by delivery speed. No l_shipmode in
    * this schema, so the grouping key is the ship-lag bucket itself
    * (FAST <= 30 days < NORMAL <= 90 < SLOW) and the two counts split
    * orders into critical (URGENT/HIGH) vs other priority — Q12's
    * sum(CASE) pair over one fact join, one combinable aggregate. */
  val qJoinQ12: GQuery = GQuery(
    "q_join_q12",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp_ntz"))
      val lag = datediff($"l_shipdate", $"o_orderdate")
      li.join(Tables.orders(spark, dir).hint("shuffle_hash"),
          $"l_orderkey" === $"o_orderkey")
        .select(
          when(lag <= 30, "FAST").when(lag <= 90, "NORMAL")
            .otherwise("SLOW").as("speed"),
          $"o_orderpriority")
        .groupBy($"speed")
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy($"speed")
    },
    Some("""
      SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                  THEN 'FAST'
                  WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
                  THEN 'NORMAL' ELSE 'SLOW' END AS speed,
             cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) as bigint) AS high_line_count,
             cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 0 ELSE 1 END) as bigint) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY speed
      ORDER BY speed"""),
  )

  /** TPC-H Q13 shape — customer order-count distribution: how many
    * customers placed k qualifying orders each. Two STACKED aggregations
    * (per-customer count, then histogram of counts); the left join keeps
    * zero-order customers in the k=0 bucket, and the priority exclusion
    * lives in the JOIN CONDITION (a WHERE would turn the outer join
    * inner and silently drop the zero bucket — the classic Q13 trap).
    * Orders is the bigger side: count(o_custkey) over the join, never a
    * collect. */
  val qJoinQ13: GQuery = GQuery(
    "q_join_q13",
    (spark, dir) => {
      import spark.implicits._
      val ord = Tables.orders(spark, dir)
        .filter($"o_orderpriority" =!= "1-URGENT")
        .select($"o_custkey", $"o_orderkey")
      Tables.customer(spark, dir)
        .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },
    Some("""
      SELECT c_count, count(*) AS custdist
      FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""),
  )

  /** TPC-H Q14 shape — promo revenue share for one month: a conditional
    * and an unconditional decimal sum in the SAME single-pass aggregate
    * (never two scans diffed), finished as one IEEE division. p_type =
    * 'PROMO' stands in for Q14's LIKE 'PROMO%'. Global aggregate: the
    * map-side partials are two decimals per task — constant-size
    * regardless of SF. */
  val qJoinQ14: GQuery = GQuery(
    "q_join_q14",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
        .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1996-04-01").cast("timestamp_ntz"))
      val rev = $"l_extendedprice" * (lit(1) - $"l_discount")
      li.join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
        .agg(
          dsum(when($"p_type" === "PROMO", rev).otherwise(lit(0.0)))
            .as("promo_rev"),
          dsum(rev).as("total_rev"))
        .select($"promo_rev", $"total_rev",
          r6(lit(100.0) * $"promo_rev" / $"total_rev").as("promo_share"))
    },
    Some(s"""
      SELECT promo_rev, total_rev,
             ${r6Sql("cast(100.0 as double) * promo_rev / total_rev")}
               AS promo_share
      FROM (
        SELECT
          ${dsumSql("CASE WHEN p_type = 'PROMO' " +
            "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
            AS promo_rev,
          ${dsumSql("l_extendedprice * (1 - l_discount)")} AS total_rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')"""),
  )

  /** TPC-H Q15 shape — top supplier(s) by quarterly revenue: the
    * per-supplier aggregate is computed ONCE and reused for both the
    * scalar max and the equality probe (Q15's CREATE VIEW, as a shared
    * plan subtree); the 1-row max broadcasts to the equality join, so
    * finding the argmax costs one extra constant-size exchange, not a
    * global sort. Ties all surface (the >= ANY semantics), ordered by
    * suppkey. dsum makes the revenue doubles — and hence the equality —
    * bit-identical in both engines. */
  val qJoinQ15: GQuery = GQuery(
    "q_join_q15",
    (spark, dir) => {
      import spark.implicits._
      // The explicit isNotNull matters: the equality-probe branch gets an
      // inferred isnotnull(l_suppkey) from the join, the max branch does
      // not — without it the two rev subtrees are not canonically equal
      // and ReuseExchange re-scans lineitem twice (verified on the final
      // adaptive plan).
      val rev = Tables.lineitem(spark, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1996-04-01").cast("timestamp_ntz") &&
          $"l_suppkey".isNotNull)
        .groupBy($"l_suppkey")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
          .as("total_rev"))
      val top = rev.agg(max($"total_rev").as("max_rev"))
      rev.join(broadcast(top), $"total_rev" === $"max_rev")
        .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name", $"total_rev")
        .orderBy($"s_suppkey")
    },
    Some(s"""
      WITH rev AS (
        SELECT l_suppkey,
               ${dsumSql("l_extendedprice * (1 - l_discount)")} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_rev
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_rev = (SELECT max(total_rev) FROM rev)
      ORDER BY s_suppkey"""),
  )

  /** TPC-H Q19 shape — disjunctive brand/quantity/size predicate over
    * part⋈lineitem. The scale move: the common bounds of the three
    * disjuncts are FACTORED OUT by hand (brands IN, p_size <= 15,
    * l_quantity <= 30) so each scan prunes before the join — Catalyst
    * does not reliably CNF-push an OR that straddles both sides — and
    * the exact disjunction then runs on the join's (tiny) survivor set.
    * One global conditional sum + count. */
  val qJoinQ19: GQuery = GQuery(
    "q_join_q19",
    (spark, dir) => {
      import spark.implicits._
      val pt = Tables.part(spark, dir)
        .filter($"p_brand".isin("Brand#12", "Brand#23", "Brand#34") &&
          $"p_size" <= 15)
        .select($"p_partkey", $"p_brand", $"p_size")
      val li = Tables.lineitem(spark, dir).filter($"l_quantity" <= 30.0)
      li.join(pt, $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"l_quantity".between(1.0, 11.0) &&
            $"p_size".between(1, 5)) ||
          ($"p_brand" === "Brand#23" && $"l_quantity".between(10.0, 20.0) &&
            $"p_size".between(1, 10)) ||
          ($"p_brand" === "Brand#34" && $"l_quantity".between(20.0, 30.0) &&
            $"p_size".between(1, 15)))
        .agg(
          dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some(s"""
      SELECT ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
              AND p_size BETWEEN 1 AND 5)
         OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
              AND p_size BETWEEN 1 AND 10)
         OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
              AND p_size BETWEEN 1 AND 15)"""),
  )

  /** TPC-H Q21 shape — suppliers who kept orders waiting: on finished
    * ('F') multi-supplier orders, the supplier whose lineitem was late
    * (shipped > 60 days after order; stands in for receipt > commit)
    * while NO other supplier on the order was late. The EXISTS /
    * NOT-EXISTS pair is collapsed into ONE per-order aggregate — an
    * order contributes iff it has >1 distinct suppliers and exactly 1
    * distinct LATE supplier, and then every late lineitem (all owned by
    * that one supplier) counts — so lineitem and orders are each
    * scanned once and shuffled once on the order key, where the naive
    * semi+anti plan re-derives the late set per subquery (measured 6
    * lineitem scans in the final plan, 2.4x slower at sf0.1). Top 25
    * by count via TakeOrdered. */
  val qJoinQ21: GQuery = GQuery(
    "q_join_q21",
    (spark, dir) => {
      import spark.implicits._
      val late = $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS")
      // two-level agg instead of countDistinct pairs: the per-(order,
      // supplier) collapse needs no Expand, and the second level runs
      // over |order×supplier| rows with plain combinable counts
      val perSupp = Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        .join(Tables.orders(spark, dir)
            .filter($"o_orderstatus" === "F")
            .select($"o_orderkey", $"o_orderdate").hint("shuffle_hash"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey", $"l_suppkey")
        .agg(count(when(late, lit(1))).as("late_rows"))
      val perOrder = perSupp
        .groupBy($"l_orderkey")
        .agg(
          count(lit(1)).as("n_supp"),
          sum(when($"late_rows" > 0, 1).otherwise(0)).as("n_late_supp"),
          max(when($"late_rows" > 0, $"l_suppkey")).as("late_supp"),
          sum($"late_rows").as("n_late_rows"))
        .filter($"n_supp" > 1 && $"n_late_supp" === 1)
      perOrder
        .join(Tables.supplier(spark, dir), $"late_supp" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(sum($"n_late_rows").cast("long").as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(25)
    },
    Some("""
      WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      SELECT s_name, count(*) AS numwait
      FROM late l1
      JOIN supplier ON l1.l_suppkey = s_suppkey
      WHERE EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM late l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 25"""),
  )

  /** TPC-H Q22 shape — dormant rich customers by code bucket: customers
    * whose balance beats the positive-balance average and who placed no
    * RECENT order (>= 2000-01-01; this data has no order-less customers,
    * so recency stands in for Q22's no-orders-at-all). The code bucket
    * is the custkey's last digit (no phone column). The scalar average
    * is ONE decimal-sum/count division broadcast into the comparison —
    * exact decimal accumulation makes the threshold, and therefore the
    * qualifying set, bit-identical in both engines; the NOT EXISTS is a
    * LEFT ANTI against the date-pruned orders projection. */
  val qJoinQ22: GQuery = GQuery(
    "q_join_q22",
    (spark, dir) => {
      import spark.implicits._
      val codes = Seq(1, 3, 5, 7, 9)
      val sel = Tables.customer(spark, dir)
        .withColumn("cntrycode", ($"c_custkey" % 10).cast("int"))
        .filter($"cntrycode".isin(codes: _*))
      val thr = sel.filter($"c_acctbal" > 0.0)
        .agg((sum($"c_acctbal".cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .cast("double") / count(lit(1))).as("avg_bal"))
      val recent = Tables.orders(spark, dir)
        .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp_ntz"))
        .select($"o_custkey")
      sel.join(broadcast(thr)).filter($"c_acctbal" > $"avg_bal")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"cntrycode")
        .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
        .orderBy($"cntrycode")
    },
    Some(s"""
      WITH sel AS (
        SELECT cast(c_custkey % 10 as int) AS cntrycode, c_custkey, c_acctbal
        FROM customer
        WHERE cast(c_custkey % 10 as int) IN (1, 3, 5, 7, 9))
      SELECT cntrycode, count(*) AS numcust,
             ${dsumSql("c_acctbal")} AS totacctbal
      FROM sel
      WHERE c_acctbal > (
          SELECT cast(sum(cast(c_acctbal as decimal(30,6))) as double)
                   / count(*)
          FROM sel WHERE c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY cntrycode
      ORDER BY cntrycode"""),
  )

  /** TPC-H Q6 shape — forecasting revenue change: one conditional sum
    * over filtered lineitem, no join at all. All three predicates are
    * range/bound filters on scanned columns, so the whole WHERE reaches
    * the parquet scan as PushedFilters and row groups outside the year
    * or discount band never decompress. The aggregate is a single
    * decimal per task (map-side partial), constant-size at any SF. */
  val qAggQ6: GQuery = GQuery(
    "q_agg_q6",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp_ntz") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24.0)
        .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some(s"""
      SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue,
             count(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""),
  )

  /** TPC-H Q2 shape — minimum-cost supplier per part in one region.
    * No partsupp in this schema: the (part, supplier) cost relation is
    * aggregated off lineitem, with min unit price standing in for
    * ps_supplycost (min over per-row doubles is exact — no
    * accumulation order — so it bit-matches DuckDB without decimal
    * staging). The part and region-supplier prunes are pushed BELOW
    * that aggregate — legal because the agg key is exactly the two
    * join keys, so filtering pairs before or after the per-pair min is
    * identical — shrinking the groupBy input from |lineitem| to the
    * few matching parts' rows (measured 1.38s → 0.88s at sf0.1). The
    * per-part argmin is then de-correlated: ONE aggregate over the
    * pruned cost relation, equality-joined back (double equality is
    * safe for a min), ties surfacing like Q2's >= ANY. Supplier is
    * un-hinted (SF-growing); TakeOrdered keeps 100. */
  val qJoinQ2: GQuery = GQuery(
    "q_join_q2",
    (spark, dir) => {
      import spark.implicits._
      val regionNations = Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)
            .filter($"r_name" === "EUROPE")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      val sup = Tables.supplier(spark, dir)
        .join(broadcast(regionNations), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
      val pt = Tables.part(spark, dir)
        .filter($"p_size".between(10, 20) && $"p_type" === "STANDARD")
        .select($"p_partkey", $"p_brand")
      val costs = Tables.lineitem(spark, dir)
        .select($"l_partkey", $"l_suppkey", $"l_extendedprice", $"l_quantity")
        .join(pt, $"l_partkey" === $"p_partkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .groupBy($"p_partkey", $"p_brand", $"s_suppkey", $"s_name",
          $"s_acctbal", $"n_name")
        .agg(min($"l_extendedprice" / $"l_quantity").as("supplycost"))
      val minCost = costs.groupBy($"p_partkey".as("mc_partkey"))
        .agg(min($"supplycost").as("min_cost"))
      costs
        .join(minCost,
          $"p_partkey" === $"mc_partkey" && $"supplycost" === $"min_cost")
        .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey",
          $"p_brand", r6($"supplycost").as("supplycost"))
        .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
        .limit(100)
    },
    Some(s"""
      WITH costs AS (
        SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
               supplycost
        FROM (
          SELECT l_partkey, l_suppkey,
                 min(l_extendedprice / l_quantity) AS supplycost
          FROM lineitem GROUP BY l_partkey, l_suppkey)
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN part ON l_partkey = p_partkey
        WHERE r_name = 'EUROPE'
          AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'),
      mc AS (
        SELECT p_partkey AS mc_partkey, min(supplycost) AS min_cost
        FROM costs GROUP BY p_partkey)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
             ${r6Sql("supplycost")} AS supplycost
      FROM costs JOIN mc
        ON p_partkey = mc_partkey AND supplycost = min_cost
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100"""),
  )

  /** TPC-H Q11 shape — important stock identification: parts whose
    * one-nation shipped value exceeds a fixed fraction of that nation's
    * total. The global total is the per-part values re-accumulated as
    * decimals (the values are 2-dp doubles, so the decimal sum is
    * exact and order-free) and broadcast as ONE row into the
    * comparison — two aggregates, zero self-joins. The fraction
    * literal is cast to double on the DuckDB side so both engines
    * compare against the same IEEE product. */
  val qJoinQ11: GQuery = GQuery(
    "q_join_q11",
    (spark, dir) => {
      import spark.implicits._
      val natSup = Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)
            .filter($"n_name" === "NATION_3")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey")
      val pv = Tables.lineitem(spark, dir)
        .join(natSup, $"l_suppkey" === $"s_suppkey")
        .groupBy($"l_partkey")
        .agg(dsum($"l_extendedprice").as("value"))
      val total = pv.agg(
        (sum($"value".cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .cast("double") * lit(0.0001)).as("threshold"))
      pv.join(broadcast(total)).filter($"value" > $"threshold")
        .select($"l_partkey", $"value")
        .orderBy($"value".desc, $"l_partkey")
    },
    Some(s"""
      WITH pv AS (
        SELECT l_partkey, ${dsumSql("l_extendedprice")} AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey)
      SELECT l_partkey, value
      FROM pv
      WHERE value > (
        SELECT cast(sum(cast(value as decimal(30,6))) as double)
                 * cast(0.0001 as double)
        FROM pv)
      ORDER BY value DESC, l_partkey"""),
  )

  /** TPC-H Q20 shape — suppliers holding excess share: suppliers who
    * shipped more than twice their fair share (2/n_suppliers) of some
    * small-named part's total quantity. The synthetic data is uniform —
    * a TPC-H-style fixed 50% cut selects nothing at any SF — so
    * "excess" is relative to the part's supplier count, which keeps
    * selectivity SF-stable (~1% of suppliers). Share numerator and
    * denominator BOTH derive from one aggregation of the part-filtered
    * lineitem (the per-part total re-accumulates the 2-dp per-supplier
    * sums as exact decimals; the comparison is integer×decimal-derived
    * doubles, bit-identical cross-engine), and the two stacked groupBys
    * ride one partkey-compatible shuffle. The supplier list comes out
    * through a LEFT SEMI (a supplier heavy on many parts appears once);
    * the 25-row nation broadcast only decorates the output. */
  val qJoinQ20: GQuery = GQuery(
    "q_join_q20",
    (spark, dir) => {
      import spark.implicits._
      // explicit isNotNull on both keys: the heavy-join branch infers
      // them, the per-part aggregate branch does not — without this the
      // two perPS subtrees are not canonically equal and ReuseExchange
      // re-scans lineitem (4 scans in the final plan instead of 1)
      val perPS = Tables.lineitem(spark, dir)
        .filter($"l_partkey".isNotNull && $"l_suppkey".isNotNull)
        .join(Tables.part(spark, dir)
            .filter($"p_name".like("small%")).select($"p_partkey"),
          $"l_partkey" === $"p_partkey")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(dsum($"l_quantity").as("ps_qty"))
      val perPart = perPS.groupBy($"l_partkey".as("pp_partkey"))
        .agg(
          sum($"ps_qty".cast(org.apache.spark.sql.types.DecimalType(30, 6)))
            .cast("double").as("p_qty"),
          count(lit(1)).as("nsupp"))
      val heavy = perPS
        .join(perPart, $"l_partkey" === $"pp_partkey")
        .filter($"ps_qty" * $"nsupp" > lit(2.0) * $"p_qty")
        .select($"l_suppkey")
      Tables.supplier(spark, dir)
        .join(heavy, $"s_suppkey" === $"l_suppkey", "left_semi")
        .join(broadcast(Tables.nation(spark, dir)),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
        .orderBy($"s_name")
    },
    Some(s"""
      WITH ps AS (
        SELECT l_partkey, l_suppkey, ${dsumSql("l_quantity")} AS ps_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
        GROUP BY l_partkey, l_suppkey),
      pp AS (
        SELECT l_partkey AS pp_partkey,
               cast(sum(cast(ps_qty as decimal(30,6))) as double) AS p_qty,
               count(*) AS nsupp
        FROM ps GROUP BY l_partkey),
      heavy AS (
        SELECT l_suppkey FROM ps JOIN pp ON l_partkey = pp_partkey
        WHERE ps_qty * nsupp > cast(2.0 as double) * p_qty)
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE EXISTS (SELECT 1 FROM heavy WHERE l_suppkey = s_suppkey)
      ORDER BY s_name"""),
  )

  /** TPC-H Q3 shape — shipping-priority top-10: revenue of orders placed
    * before a cutoff whose lineitems ship after it, for one customer
    * segment. (The schema has no o_shippriority; o_orderpriority stands
    * in.) The canonical fact-to-fact shuffle join with a broadcast-able
    * dimension filter: customer's segment predicate prunes ~1/5 of the
    * orders side BEFORE the lineitem join, both date predicates push to
    * the scans, and the top-10 is a deterministic (revenue desc,
    * orderkey) sort-limit — TakeOrderedAndProject, no global sort. */
  val qJoinQ3: GQuery = GQuery(
    "q_join_q3",
    (spark, dir) => {
      import spark.implicits._
      val cut = lit("1995-03-15").cast("timestamp_ntz")
      val cust = Tables.customer(spark, dir)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val ord = Tables.orders(spark, dir)
        .filter($"o_orderdate" < cut)
        .join(cust, $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      Tables.lineitem(spark, dir)
        .filter($"l_shipdate" > cut)
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
          .as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""),
  )

  val all: Seq[GQuery] = Seq(
    qAggQ6, qJoinQ2, qJoinQ3, qJoinQ7, qJoinQ9, qJoinQ10, qJoinQ11,
    qJoinQ12, qJoinQ13, qJoinQ14, qJoinQ15, qJoinQ19, qJoinQ20, qJoinQ21,
    qJoinQ22)
}
