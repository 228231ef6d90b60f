package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Join operators (SURVEY.md §2.B.3). Strategy posture for 100 TB:
  *  - dimension tables (region/nation/customer-at-dim-scale, literal band
  *    tables) are explicitly `broadcast()` — no shuffle of the fact side;
  *  - fact⋈fact joins pin `hint("merge")` (sort-merge) so the plan is
  *    stable and spill-safe at scale (shuffled hash can OOM on skew);
  *  - the as-of join is a window emulation — one shuffle by key, no
  *    row-explosion, which is the scalable form (a range cross-join would
  *    be quadratic per user).
  */
object Joins {

  /** Broadcast star join: fact orders ⋈ customer ⋈ nation ⋈ region.
    * Only TRUE dimensions (nation: 25 rows, region: 5 — constant in SF)
    * carry an explicit broadcast hint. Customer is NOT hinted: it grows
    * linearly with SF (~15M rows at 100×; a pinned broadcast would be a
    * multi-GB ship to every executor → OOM). The planner's stats/AQE
    * broadcast customer while it fits the threshold and degrade to a
    * shuffle join beyond it — PlanSpec proves both the BHJ-by-stats plan
    * and the degradation with the threshold disabled, same posture as
    * q_join_smj / q_join_q5. */
  val qJoinBcast: GQuery = GQuery(
    "q_join_bcast",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
        .orderBy($"r_name", $"n_name")
    },
    Some(s"""
      SELECT r_name, n_name, count(*) AS n_orders,
             ${dsumSql("o_totalprice")} AS total_price
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""),
  )

  /** TPC-H Q3 shape: fact⋈fact sort-merge join, agg, top-10. The merge
    * hint keeps the physical plan stable (SMJ spills instead of OOM).
    * Customer carries NO broadcast hint: it grows with the fact tables
    * (linear in SF), so a forced broadcast is an OOM at 100×. The
    * planner's stats/AQE pick broadcast while it fits the threshold and
    * degrade to a shuffle join beyond it (PlanSpec proves both). */
  val qJoinSmj: GQuery = GQuery(
    "q_join_smj",
    (spark, dir) => {
      import spark.implicits._
      val cutoff = lit("1997-01-01").cast("timestamp_ntz")
      val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.orders(spark, dir).filter($"o_orderdate" < cutoff)
      val li = Tables.lineitem(spark, dir).filter($"l_shipdate" > cutoff)
      li.hint("merge").join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
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
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""),
  )

  /** Left outer join preserving customers with zero orders. */
  val qJoinOuter: GQuery = GQuery(
    "q_join_outer",
    (spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(
          count($"o_orderkey").as("n_orders"),
          coalesce(dsum($"o_totalprice"), lit(0.0)).as("total_spent"))
        .orderBy($"c_custkey")
    },
    Some(s"""
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             coalesce(${dsumSql("o_totalprice")}, 0.0) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey"""),
  )

  /** Left semi (EXISTS): customers with at least one finished order. */
  val qJoinSemi: GQuery = GQuery(
    "q_join_semi",
    (spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir)
        .join(
          Tables.orders(spark, dir).filter($"o_orderstatus" === "F"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey"""),
  )

  /** Left anti (NOT EXISTS): customers with no orders at all. */
  val qJoinAnti: GQuery = GQuery(
    "q_join_anti",
    (spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""),
  )

  /** Theta/range (banded) join: fact rows land in price bands via a
    * broadcast nested-loop against a tiny literal band table — the
    * scalable form of a non-equi join (small side broadcast, fact streams). */
  val qJoinRange: GQuery = GQuery(
    "q_join_range",
    (spark, dir) => {
      import spark.implicits._
      val bands = Seq(
        (1, 0.0, 20000.0), (2, 20000.0, 40000.0), (3, 40000.0, 60000.0),
        (4, 60000.0, 80000.0), (5, 80000.0, 1e12))
        .toDF("band_id", "lo", "hi")
      Tables.lineitem(spark, dir)
        .join(broadcast(bands),
          $"l_extendedprice" >= $"lo" && $"l_extendedprice" < $"hi")
        .groupBy($"band_id")
        .agg(count(lit(1)).as("n_items"), dsum($"l_extendedprice").as("band_total"))
        .orderBy($"band_id")
    },
    Some(s"""
      SELECT band_id, count(*) AS n_items,
             ${dsumSql("l_extendedprice")} AS band_total
      FROM lineitem
      JOIN (VALUES (1, 0.0, 20000.0), (2, 20000.0, 40000.0),
                   (3, 40000.0, 60000.0), (4, 60000.0, 80000.0),
                   (5, 80000.0, 1e12)) AS bands(band_id, lo, hi)
        ON l_extendedprice >= lo AND l_extendedprice < hi
      GROUP BY band_id
      ORDER BY band_id"""),
  )

  /** As-of join (nearest prior): each purchase event matched to the same
    * user's latest prior-or-equal signup. Window emulation — one shuffle
    * by user_id, no row explosion; at 100 TB this is a single
    * hash-partitioned sort per key, vs. a quadratic range join. */
  val qJoinAsof: GQuery = GQuery(
    "q_join_asof",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .filter($"event_type".isin("signup", "purchase"))
        .select($"event_id", $"user_id", $"ts", $"event_type",
          when($"event_type" === "signup", $"ts").as("signup_ts"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts",
          when($"event_type" === "signup", 0).otherwise(1),
          $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("asof_signup_ts", last($"signup_ts", ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"asof_signup_ts")
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id, ts, asof_signup_ts FROM (
        SELECT event_id, user_id, ts, event_type,
          last_value(signup_ts IGNORE NULLS) OVER (
            PARTITION BY user_id
            ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END,
                     event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_ts
        FROM (
          SELECT event_id, user_id, date_trunc('second', ts) AS ts, event_type,
            CASE WHEN event_type = 'signup'
                 THEN date_trunc('second', ts) END AS signup_ts
          FROM events WHERE event_type IN ('signup', 'purchase')) ev
      ) t WHERE event_type = 'purchase'
      ORDER BY event_id"""),
  )

  /** Forward as-of join (nearest subsequent): each purchase matched to
    * the same user's earliest at-or-after error event — the symmetric twin
    * of [[qJoinAsof]] (think "next maintenance window after the trade").
    * Same one-shuffle window emulation, frame flipped to
    * [currentRow, unboundedFollowing]. */
  val qJoinAsofFwd: GQuery = GQuery(
    "q_join_asof_fwd",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .filter($"event_type".isin("error", "purchase"))
        .select($"event_id", $"user_id", $"ts", $"event_type",
          when($"event_type" === "error", $"ts").as("error_ts"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts",
          when($"event_type" === "purchase", 0).otherwise(1),
          $"event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ev.withColumn("next_error_ts", first($"error_ts", ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"next_error_ts")
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id, ts, next_error_ts FROM (
        SELECT event_id, user_id, ts, event_type,
          first_value(error_ts IGNORE NULLS) OVER (
            PARTITION BY user_id
            ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END,
                     event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_error_ts
        FROM (
          SELECT event_id, user_id, date_trunc('second', ts) AS ts, event_type,
            CASE WHEN event_type = 'error'
                 THEN date_trunc('second', ts) END AS error_ts
          FROM events WHERE event_type IN ('error', 'purchase')) ev
      ) t WHERE event_type = 'purchase'
      ORDER BY event_id"""),
  )

  /** Interval join, LEFT OUTER — the batch twin of the streaming
    * stream-stream left-outer interval join
    * (graft.streaming.Streams.purchaseSignupJoinOuter, golden-tested in
    * StreamsSpec): every purchase keeps its row, matched to any signup by
    * the SAME user within the 3 days before it, or null-extended when no
    * signup qualifies — the nulls-included semantics the streaming side
    * emits after watermark expiry. The plan is an EQUI-join on user_id
    * with the interval predicate as a post-join filter (hash/SMJ, never a
    * nested loop), the same shape that holds at 100 TB: one shuffle by
    * user, per-key fan-out bounded by signups-per-user. */
  val qJoinIntervalOuter: GQuery = GQuery(
    "q_join_interval_outer",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"),
          $"ts".as("purchase_ts"))
      val signups = ev.filter($"event_type" === "signup")
        .select($"user_id".as("s_user_id"), $"event_id".as("signup_id"),
          $"ts".as("signup_ts"))
      purchases.join(signups,
          $"user_id" === $"s_user_id" &&
            $"signup_ts" <= $"purchase_ts" &&
            $"signup_ts" >= $"purchase_ts" - expr("INTERVAL 3 DAYS"),
          "left_outer")
        .select($"user_id", $"purchase_id", $"purchase_ts",
          $"signup_id", $"signup_ts")
        .orderBy($"purchase_id", $"signup_id".asc_nulls_first)
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id, date_trunc('second', ts) AS ts, event_type
        FROM events),
      purchases AS (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
        FROM ev WHERE event_type = 'purchase'),
      signups AS (
        SELECT user_id AS s_user_id, event_id AS signup_id, ts AS signup_ts
        FROM ev WHERE event_type = 'signup')
      SELECT user_id, purchase_id, purchase_ts, signup_id, signup_ts
      FROM purchases LEFT JOIN signups
        ON user_id = s_user_id
           AND signup_ts <= purchase_ts
           AND signup_ts >= purchase_ts - INTERVAL 3 DAY
      ORDER BY purchase_id, signup_id ASC NULLS FIRST"""),
  )

  /** Cross join of the two tiny dims (125 rows) — the only place a
    * cartesian product is ever acceptable. */
  val qJoinCross: GQuery = GQuery(
    "q_join_cross",
    (spark, dir) => {
      import spark.implicits._
      Tables.region(spark, dir).crossJoin(Tables.nation(spark, dir))
        .select($"r_name", $"n_name")
        .orderBy($"r_name", $"n_name")
    },
    Some("""
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name"""),
  )

  /** TPC-H Q5 shape: six-way join (two fact edges + three broadcast dims)
    * with the local-supplier condition (c_nationkey = s_nationkey) — the
    * deepest join tree in the inventory; Catalyst's ReorderJoin and the
    * broadcast/SMJ split both get exercised. */
  val qJoinQ5: GQuery = GQuery(
    "q_join_q5",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
      val ord = Tables.orders(spark, dir)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp_ntz"))
      // Region predicate pushed ahead of the fact join: resolve the
      // eligible nations first (tiny), semi-filter customer by them, and
      // let the inner join to `elig` at the end both name and filter the
      // supplier nation. Cuts rows flowing out of the big join by ~3/5
      // before any per-row work — the win grows with scale.
      val elig = Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir).filter($"r_name".isin("ASIA", "EUROPE"))),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      // customer and supplier grow linearly with SF — no broadcast hints
      // on them (a forced broadcast is a scale-killer at 100×); stats/AQE
      // choose broadcast only while they fit autoBroadcastJoinThreshold.
      // Only the geography-bounded `elig` (≤25 rows at any SF) and the
      // region literal keep explicit broadcasts.
      val cust = Tables.customer(spark, dir)
        .join(broadcast(elig.select($"n_nationkey")),
          $"c_nationkey" === $"n_nationkey", "left_semi")
      li.join(ord.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(Tables.supplier(spark, dir),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(elig), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"n_name")
    },
    Some(s"""
      SELECT n_name,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND r_name IN ('ASIA', 'EUROPE')
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""),
  )

  /** TPC-H Q8 shape — market share: one nation's fraction of regional
    * revenue per year. The numerator is a CONDITIONAL aggregate of the
    * same join tree as the denominator, so the whole share computes in
    * ONE pass over the fact join (sum(CASE) beside sum), never two passes
    * diffed — the pattern that keeps share/ratio reports single-scan at
    * any scale. Join posture mirrors q_join_q5: fact-fact edge shuffled,
    * geography chain broadcast, no hints on SF-growing tables. Shares are
    * ratios of the two decimal-summed revenues, IEEE-rounded. */
  val qJoinQ8: GQuery = GQuery(
    "q_join_q8",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
      val ord = Tables.orders(spark, dir)
      val geo = Tables.customer(spark, dir)
        .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
        .select($"c_custkey", $"n_name", $"r_name")
      val rev = ($"l_extendedprice" * (lit(1) - $"l_discount"))
      li.join(ord.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey")
        .join(geo, $"o_custkey" === $"c_custkey")
        .groupBy(year($"o_orderdate").cast("int").as("o_year"), $"r_name")
        .agg(
          dsum(rev).as("total_rev"),
          dsum(when($"n_name" === "NATION_7", rev).otherwise(lit(0.0)))
            .as("nation_rev"))
        .select($"o_year", $"r_name", $"total_rev", $"nation_rev",
          r6($"nation_rev" / $"total_rev").as("mkt_share"))
        .orderBy($"o_year", $"r_name")
    },
    Some(s"""
      SELECT cast(year(o_orderdate) as int) AS o_year, r_name,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS total_rev,
             ${dsumSql(
               "CASE WHEN n_name = 'NATION_7' " +
                 "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
               AS nation_rev,
             ${r6Sql(
               "(" + dsumSql("CASE WHEN n_name = 'NATION_7' " +
                 "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END") +
                 ") / (" + dsumSql("l_extendedprice * (1 - l_discount)") + ")")}
               AS mkt_share
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY o_year, r_name
      ORDER BY o_year, r_name"""),
  )

  /** Full outer join between two aggregates with key ranges that overlap
    * only partially BY CONSTRUCTION (sizes 1–25 vs 20–50): left-only,
    * both, and right-only rows all exist at every SF, so the outer
    * semantics (null-extension on both sides) are exercised non-vacuously.
    * Both inputs are pre-aggregated — the outer join runs on ≤50-row
    * sides, never on raw fact tables. */
  val qJoinFull: GQuery = GQuery(
    "q_join_full",
    (spark, dir) => {
      import spark.implicits._
      val part = Tables.part(spark, dir)
      val small = part.filter($"p_size" <= 25).groupBy($"p_size")
        .agg(count(lit(1)).as("n_small"), dsum($"p_retailprice").as("val_small"))
      val large = part.filter($"p_size" >= 20).groupBy($"p_size")
        .agg(count(lit(1)).as("n_large"))
      small.join(large, Seq("p_size"), "full")
        .select($"p_size",
          coalesce($"n_small", lit(0L)).as("n_small"),
          coalesce($"n_large", lit(0L)).as("n_large"),
          coalesce($"val_small", lit(0.0)).as("val_small"))
        .orderBy($"p_size")
    },
    Some(s"""
      WITH s AS (SELECT p_size, count(*) AS n_small,
                        ${dsumSql("p_retailprice")} AS val_small
                 FROM part WHERE p_size <= 25 GROUP BY p_size),
      l AS (SELECT p_size, count(*) AS n_large
            FROM part WHERE p_size >= 20 GROUP BY p_size)
      SELECT coalesce(s.p_size, l.p_size) AS p_size,
             coalesce(n_small, 0) AS n_small,
             coalesce(n_large, 0) AS n_large,
             coalesce(val_small, 0.0) AS val_small
      FROM s FULL JOIN l ON s.p_size = l.p_size
      ORDER BY p_size"""),
  )

  /** Skew-salted equi-join ([[graft.engine.Skew.saltedJoin]]): lineitem
    * (the potentially-skewed big side) joined to supplier replicated
    * `salts`× with the key widened to (key, salt) — the explicit tool for
    * a hot key AQE can't split (first materialization, no runtime stats).
    * Each left row matches exactly one replica, so the result multiset —
    * and the oracle — is identical to the plain join; only the shuffle
    * layout changes. */
  val qJoinSalted: GQuery = GQuery(
    "q_join_salted",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
        .select($"l_suppkey".as("s_suppkey"), $"l_extendedprice", $"l_discount")
      val su = Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
      graft.engine.Skew.saltedJoin(li, su, "s_suppkey", salts = 8)
        .groupBy($"s_suppkey", $"s_name")
        .agg(count(lit(1)).as("n_items"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
        .orderBy($"s_suppkey")
    },
    Some(s"""
      SELECT s_suppkey, s_name, count(*) AS n_items,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_suppkey, s_name
      ORDER BY s_suppkey"""),
  )

  /** TPC-H Q17 shape — small-quantity revenue against a PER-GROUP derived
    * threshold: lineitems whose quantity is below 20% of their part's own
    * average quantity, for a slice of parts. The correlated scalar
    * subquery is de-correlated into one combinable per-part aggregate
    * joined back to the fact — the per-part threshold table is |parts|
    * rows, so at 100 TB the plan is agg-shuffle + one equi-join, never a
    * per-row subquery re-execution. The threshold is exact-decimal-summed
    * then finished in fixed-order IEEE (sum -> /count -> *0.2), so both
    * engines compare l_quantity against the IDENTICAL double and the
    * below-threshold set matches bit-for-bit. */
  val qJoinQ17: GQuery = GQuery(
    "q_join_q17",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
      val thr = li.groupBy($"l_partkey".as("t_partkey"))
        .agg((lit(0.2) *
          (sum($"l_quantity".cast(org.apache.spark.sql.types.DecimalType(30, 6)))
            .cast("double") / count(lit(1)))).as("thr"))
      // p_size <= 5 keeps the part slice selective; part and the threshold
      // table both grow with SF, so no broadcast hints — stats/AQE decide.
      val pt = Tables.part(spark, dir).filter($"p_size" <= 5)
        .select($"p_partkey", $"p_brand")
      li.join(pt, $"l_partkey" === $"p_partkey")
        .join(thr, $"l_partkey" === $"t_partkey")
        .filter($"l_quantity" < $"thr")
        .groupBy($"p_brand")
        .agg(
          count(lit(1)).as("n_cheap"),
          rN(dsum($"l_extendedprice", 6) / lit(7.0), 2).as("avg_yearly"))
        .orderBy($"p_brand")
    },
    Some(s"""
      WITH thr AS (
        SELECT l_partkey AS t_partkey,
               cast(0.2 as double) *
                 (cast(sum(cast(l_quantity as decimal(30,6))) as double)
                   / count(*)) AS thr
        FROM lineitem GROUP BY l_partkey)
      SELECT p_brand, count(*) AS n_cheap,
             ${rNSql(s"(${dsumSql("l_extendedprice", 6)}) / cast(7.0 as double)", 2)}
               AS avg_yearly
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN thr ON l_partkey = t_partkey
      WHERE p_size <= 5 AND l_quantity < thr
      GROUP BY p_brand
      ORDER BY p_brand"""),
  )

  /** TPC-H Q18 shape — large-volume orders: orders whose total lineitem
    * quantity exceeds a floor, with their customer, ranked by value. ONE
    * aggregation over lineitem serves both the HAVING filter and the
    * output quantity (no second lineitem scan: the filtered per-order agg
    * IS the join input), then two equi-joins attach order and customer
    * attributes and TakeOrderedAndProject keeps the top 20 without a
    * global sort. Quantities are integral, so the exact-decimal sum makes
    * the >150 cut and the output column identical in both engines. */
  val qJoinQ18: GQuery = GQuery(
    "q_join_q18",
    (spark, dir) => {
      import spark.implicits._
      val big = Tables.lineitem(spark, dir)
        .groupBy($"l_orderkey")
        .agg(dsum($"l_quantity").as("total_qty"))
        .filter($"total_qty" > 150.0)
      Tables.orders(spark, dir)
        .join(big, $"o_orderkey" === $"l_orderkey")
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"total_qty")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(20)
    },
    Some(s"""
      WITH big AS (
        SELECT l_orderkey, ${dsumSql("l_quantity")} AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING ${dsumSql("l_quantity")} > 150.0)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             total_qty
      FROM orders
      JOIN big ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20"""),
  )

  /** TPC-H Q16 shape — supplier diversity per part attribute group,
    * EXCLUDING a blacklist: how many distinct suppliers ship each
    * (brand, size) slice, ignoring suppliers on a complaints list
    * (negative account balance stands in for Q16's LIKE '%Complaints%').
    * The supplier-per-part relation comes straight off lineitem (this
    * schema has no partsupp) WITHOUT a pre-distinct: the final
    * countDistinct dedups anyway, and measured here (part,supp) pairs
    * repeat only 1.5% across orders, so a dedup shuffle before the joins
    * costs more than the rows it removes (2.2s → 1.3s at sf0.1 dropping
    * it; on a corpus where pairs repeat heavily, reinstate it). The NOT
    * IN becomes a LEFT ANTI join BEFORE the distinct-count aggregation —
    * the decorrelated form that scales (an IN-subquery per row would
    * not). All integers; TakeOrdered keeps the top 25 without a global
    * sort. */
  val qJoinQ16: GQuery = GQuery(
    "q_join_q16",
    (spark, dir) => {
      import spark.implicits._
      val ps = Tables.lineitem(spark, dir)
        .select($"l_partkey", $"l_suppkey")
      val blacklist = Tables.supplier(spark, dir)
        .filter($"s_acctbal" < 0).select($"s_suppkey")
      ps.join(blacklist, $"l_suppkey" === $"s_suppkey", "left_anti")
        .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_size")
        .limit(25)
    },
    Some("""
      WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      ok AS (SELECT l_partkey, l_suppkey FROM ps
             WHERE l_suppkey NOT IN
               (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
      SELECT p_brand, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM ok JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_size
      LIMIT 25"""),
  )

  /** TPC-H Q4 shape — order-priority distribution of orders with at
    * least one SLOW lineitem (shipped > 90 days after the order date; the
    * schema has no commit/receipt dates, so ship-lag stands in for Q4's
    * late-delivery predicate). The EXISTS is a LEFT SEMI join on the
    * order key whose date comparison is a join-condition post-filter —
    * semi joins never multiply rows, so the aggregate input stays
    * |orders|-bounded however many lineitems match. One combinable count
    * per priority; all integers. */
  val qJoinQ4: GQuery = GQuery(
    "q_join_q4",
    (spark, dir) => {
      import spark.implicits._
      val ord = Tables.orders(spark, dir)
      val li = Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_shipdate")
      ord.join(li,
          $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
  )

  /** Nearest as-of join: each purchase matched to the same user's
    * CLOSEST signup in either direction (ties → the prior one) — the
    * third asof flavor after backward ([[qJoinAsof]]) and forward
    * ([[qJoinAsofFwd]]), used when staleness is symmetric (sensor
    * alignment, nearest quote). BOTH direction candidates share one
    * hash partitioning (a single Exchange in the plan — Spark splits
    * the flipped frame into a second WindowExec with a re-sort of the
    * already-ordered partition, an O(n) formality, not a shuffle),
    * then an IEEE second-diff comparison picks the winner — one
    * shuffle total, no row explosion, no range join. A signup at the exact purchase timestamp sorts
    * before it and is the backward candidate at distance 0. */
  val qJoinAsofNear: GQuery = GQuery(
    "q_join_asof_near",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .filter($"event_type".isin("signup", "purchase"))
        .select($"event_id", $"user_id", $"ts", $"event_type",
          when($"event_type" === "signup", $"ts").as("signup_ts"))
      val ord = Seq($"ts",
        when($"event_type" === "signup", 0).otherwise(1), $"event_id")
      val wb = Window.partitionBy($"user_id").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy($"user_id").orderBy(ord: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prior = last($"signup_ts", ignoreNulls = true).over(wb)
      val next = first($"signup_ts", ignoreNulls = true).over(wf)
      ev.withColumn("prior_ts", prior)
        .withColumn("next_ts", next)
        .filter($"event_type" === "purchase")
        .withColumn("nearest_signup_ts",
          when($"prior_ts".isNull, $"next_ts")
            .when($"next_ts".isNull, $"prior_ts")
            .when(unix_timestamp($"ts") - unix_timestamp($"prior_ts") <=
              unix_timestamp($"next_ts") - unix_timestamp($"ts"),
              $"prior_ts")
            .otherwise($"next_ts"))
        .select($"event_id", $"user_id", $"ts", $"nearest_signup_ts")
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id, ts,
             CASE WHEN prior_ts IS NULL THEN next_ts
                  WHEN next_ts IS NULL THEN prior_ts
                  WHEN epoch(ts) - epoch(prior_ts) <=
                       epoch(next_ts) - epoch(ts) THEN prior_ts
                  ELSE next_ts END AS nearest_signup_ts
      FROM (
        SELECT event_id, user_id, ts, event_type,
          last_value(signup_ts IGNORE NULLS) OVER (
            PARTITION BY user_id
            ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END,
                     event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_ts,
          first_value(signup_ts IGNORE NULLS) OVER (
            PARTITION BY user_id
            ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END,
                     event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
        FROM (
          SELECT event_id, user_id, date_trunc('second', ts) AS ts,
                 event_type,
                 CASE WHEN event_type = 'signup'
                      THEN date_trunc('second', ts) END AS signup_ts
          FROM events WHERE event_type IN ('signup', 'purchase')) ev
      ) t WHERE event_type = 'purchase'
      ORDER BY event_id"""),
  )

  val all: Seq[GQuery] = Seq(
    qJoinBcast, qJoinSmj, qJoinOuter, qJoinSemi, qJoinAnti,
    qJoinRange, qJoinAsof, qJoinAsofFwd, qJoinIntervalOuter, qJoinCross,
    qJoinQ5, qJoinFull, qJoinSalted, qJoinQ8, qJoinQ17, qJoinQ18, qJoinQ16,
    qJoinQ4, qJoinAsofNear)
}
