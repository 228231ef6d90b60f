package graft.operators

import org.apache.spark.sql.functions._
import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Sort/limit and set operations (SURVEY.md §2.B.6). Catalyst rewrites:
  * orderBy+limit → TakeOrderedAndProject (per-partition top-k, no global
  * sort — the 100 TB-safe form), distinct → aggregate, intersect/except →
  * semi/anti joins.
  */
object SetOps {

  /** Global top-20 by price — TakeOrderedAndProjectExec, with a strict
    * total order so the cutoff is deterministic. */
  val qSortLimit: GQuery = GQuery(
    "q_sort_limit",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_linenumber",
          round($"l_extendedprice", 2).as("l_extendedprice"))
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(20)
    },
    Some("""
      SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 20"""),
  )

  /** UNION ALL of two key streams + aggregation over the union. */
  val qSetUnion: GQuery = GQuery(
    "q_set_union",
    (spark, dir) => {
      import spark.implicits._
      val c = Tables.customer(spark, dir).select($"c_nationkey".as("nk"))
      val s = Tables.supplier(spark, dir).select($"s_nationkey".as("nk"))
      c.unionAll(s)
        .groupBy($"nk").agg(count(lit(1)).as("n"))
        .orderBy($"nk")
    },
    Some("""
      SELECT nk, count(*) AS n FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION ALL
        SELECT s_nationkey AS nk FROM supplier) u
      GROUP BY nk ORDER BY nk"""),
  )

  /** INTERSECT (distinct): nations having both customers and suppliers. */
  val qSetIntersect: GQuery = GQuery(
    "q_set_intersect",
    (spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir).select($"c_nationkey".as("nk"))
        .intersect(Tables.supplier(spark, dir).select($"s_nationkey".as("nk")))
        .orderBy($"nk")
    },
    Some("""
      SELECT c_nationkey AS nk FROM customer
      INTERSECT
      SELECT s_nationkey AS nk FROM supplier
      ORDER BY nk"""),
  )

  /** EXCEPT (distinct): nations with customers but no suppliers. */
  val qSetExcept: GQuery = GQuery(
    "q_set_except",
    (spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir).select($"c_nationkey".as("nk"))
        .except(Tables.supplier(spark, dir).select($"s_nationkey".as("nk")))
        .orderBy($"nk")
    },
    Some("""
      SELECT c_nationkey AS nk FROM customer
      EXCEPT
      SELECT s_nationkey AS nk FROM supplier
      ORDER BY nk"""),
  )

  /** Scalar + IN subquery shape. Spark side authors the scalable plan
    * directly: the scalar becomes a broadcast single-row join, the IN
    * becomes a semi join — exactly what Catalyst's subquery rewrites
    * produce from the SQL form the oracle runs. */
  val qSubquery: GQuery = GQuery(
    "q_subquery",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
      import org.apache.spark.sql.types.DecimalType
      val thr = o.agg(
        (sum($"o_totalprice".cast(DecimalType(30, 6))).cast("double") /
          count($"o_totalprice")).as("thr"))
      val bld = Tables.customer(spark, dir)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      o.join(bld, $"o_custkey" === $"c_custkey", "left_semi")
        .crossJoin(broadcast(thr))
        .filter($"o_totalprice" > $"thr")
        .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("o_totalprice"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_totalprice > (
          SELECT cast(sum(cast(o_totalprice as decimal(30,6))) as double)
            / count(o_totalprice) FROM orders)
        AND o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
      ORDER BY o_orderkey"""),
  )

  /** LATERAL correlated subquery with LIMIT — top-2 customers per nation,
    * expressed as the SQL-standard lateral join (Spark 4 supports LATERAL
    * natively; Catalyst rewrites it to a ranked join, so it scales like
    * q_topk_group rather than N subquery executions). */
  val qLateral: GQuery = GQuery(
    "q_lateral",
    (spark, dir) => {
      Tables.nation(spark, dir).createOrReplaceTempView("g2_nation")
      Tables.customer(spark, dir).createOrReplaceTempView("g2_customer")
      spark.sql("""
        SELECT n_nationkey, n_name, l.c_custkey, l.c_acctbal
        FROM g2_nation,
        LATERAL (SELECT c_custkey, c_acctbal FROM g2_customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
        ORDER BY n_nationkey, l.c_acctbal DESC, l.c_custkey""")
    },
    Some("""
      SELECT n_nationkey, n_name, l.c_custkey, l.c_acctbal
      FROM nation,
      LATERAL (SELECT c_custkey, c_acctbal FROM customer
               WHERE c_nationkey = n_nationkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
      ORDER BY n_nationkey, l.c_acctbal DESC, l.c_custkey"""),
  )

  /** Recursive CTE (Spark 4 WITH RECURSIVE): ancestor walk over the
    * implicit binary-tree hierarchy parent(k) = k DIV 2 for low part keys.
    * Bounded depth (log2 of the key space) — each recursion step is one
    * self-union the optimizer unrolls. */
  val qRecursive: GQuery = GQuery(
    "q_recursive",
    (spark, dir) => {
      Tables.part(spark, dir).createOrReplaceTempView("g2_part")
      spark.sql("""
        WITH RECURSIVE anc(orig, k, depth) AS (
          SELECT p_partkey, p_partkey, 0 FROM g2_part WHERE p_partkey < 64
          UNION ALL
          SELECT orig, k DIV 2, depth + 1 FROM anc WHERE k > 0)
        SELECT orig, count(*) AS n_nodes, cast(max(depth) as int) AS max_depth,
               sum(k) AS chain_sum
        FROM anc GROUP BY orig ORDER BY orig""")
    },
    Some("""
      WITH RECURSIVE anc(orig, k, depth) AS (
        SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 64
        UNION ALL
        SELECT orig, k // 2, depth + 1 FROM anc WHERE k > 0)
      SELECT orig, count(*) AS n_nodes, cast(max(depth) as int) AS max_depth,
             cast(sum(k) as bigint) AS chain_sum
      FROM anc GROUP BY orig ORDER BY orig"""),
  )

  /** Correlated scalar subquery with an inequality predicate — each
    * customer's predecessor key within their nation. Catalyst de-correlates
    * this into an aggregated self-join (no per-row re-execution). */
  val qCorrScalar: GQuery = GQuery(
    "q_corr_scalar",
    (spark, dir) => {
      Tables.customer(spark, dir).createOrReplaceTempView("g2_customer")
      spark.sql("""
        SELECT c_custkey, c_nationkey,
          (SELECT max(c2.c_custkey) FROM g2_customer c2
           WHERE c2.c_nationkey = c.c_nationkey
             AND c2.c_custkey < c.c_custkey) AS prev_in_nation
        FROM g2_customer c ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey, c_nationkey,
        (SELECT max(c2.c_custkey) FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey
           AND c2.c_custkey < c.c_custkey) AS prev_in_nation
      FROM customer c ORDER BY c_custkey"""),
  )

  /** Multiset (ALL) set ops: INTERSECT ALL keeps min(multiplicity) copies
    * per value, EXCEPT ALL subtracts multiplicities — semantics the
    * distinct variants above cannot express. Scalarized to per-key counts
    * so the driver can hash it. Catalyst plans both as a single
    * aggregate-and-generate on the value (count per side, then replicate)
    * — one shuffle each, combinable, no row explosion beyond the answer. */
  val qSetAll: GQuery = GQuery(
    "q_set_all",
    (spark, dir) => {
      import spark.implicits._
      val c = Tables.customer(spark, dir).select($"c_nationkey".as("nk"))
      val s = Tables.supplier(spark, dir).select($"s_nationkey".as("nk"))
      val ia = c.intersectAll(s).groupBy($"nk")
        .agg(count(lit(1)).as("n_inter_all"))
      val ea = c.exceptAll(s).groupBy($"nk")
        .agg(count(lit(1)).as("n_except_all"))
      ia.join(ea, Seq("nk"), "full_outer")
        .select($"nk",
          coalesce($"n_inter_all", lit(0L)).as("n_inter_all"),
          coalesce($"n_except_all", lit(0L)).as("n_except_all"))
        .orderBy($"nk")
    },
    Some("""
      WITH ia AS (
        SELECT nk, count(*) AS n_inter_all FROM (
          SELECT c_nationkey AS nk FROM customer
          INTERSECT ALL
          SELECT s_nationkey AS nk FROM supplier) i
        GROUP BY nk),
      ea AS (
        SELECT nk, count(*) AS n_except_all FROM (
          SELECT c_nationkey AS nk FROM customer
          EXCEPT ALL
          SELECT s_nationkey AS nk FROM supplier) e
        GROUP BY nk)
      SELECT coalesce(ia.nk, ea.nk) AS nk,
             coalesce(n_inter_all, 0) AS n_inter_all,
             coalesce(n_except_all, 0) AS n_except_all
      FROM ia FULL OUTER JOIN ea ON ia.nk = ea.nk
      ORDER BY nk"""),
  )

  /** NOT IN vs NOT EXISTS under NULLs — the three-valued-logic
    * semantics test every engine must get right: `x NOT IN (subquery)`
    * is UNKNOWN (filters the row) whenever the subquery contains a
    * NULL, while the NOT EXISTS form ignores NULLs and returns the
    * intuitive complement. The subquery (`CASE WHEN price > avg THEN
    * custkey END`) always yields both NULLs and values, so the two
    * counts differ by construction — an engine that "fixes" NOT IN to
    * act like NOT EXISTS hash-mismatches. Spark plans the NOT IN as a
    * null-aware anti join (the SQL surface is the point here — this is
    * the one declared query exercising spark.sql directly). */
  val qNotInNull: GQuery = GQuery(
    "q_not_in_null",
    (spark, dir) => {
      Tables.customer(spark, dir).createOrReplaceTempView("nin_customer")
      Tables.orders(spark, dir).createOrReplaceTempView("nin_orders")
      spark.sql("""
        SELECT
          (SELECT count(*) FROM nin_customer
           WHERE c_custkey NOT IN (
             SELECT CASE WHEN o_totalprice >
                 (SELECT cast(sum(cast(o_totalprice as decimal(30,6))) as double) / count(*) FROM nin_orders)
               THEN o_custkey END
             FROM nin_orders)) AS n_not_in,
          (SELECT count(*) FROM nin_customer c
           WHERE NOT EXISTS (
             SELECT 1 FROM nin_orders o
             WHERE o.o_totalprice >
                 (SELECT cast(sum(cast(o_totalprice as decimal(30,6))) as double) / count(*) FROM nin_orders)
               AND o.o_custkey = c.c_custkey)) AS n_not_exists""")
    },
    Some("""
      SELECT
        (SELECT count(*) FROM customer
         WHERE c_custkey NOT IN (
           SELECT CASE WHEN o_totalprice >
               (SELECT cast(sum(cast(o_totalprice as decimal(30,6))) as double) / count(*) FROM orders)
             THEN o_custkey END
           FROM orders)) AS n_not_in,
        (SELECT count(*) FROM customer c
         WHERE NOT EXISTS (
           SELECT 1 FROM orders o
           WHERE o.o_totalprice > (SELECT cast(sum(cast(o_totalprice as decimal(30,6))) as double) / count(*) FROM orders)
             AND o.o_custkey = c.c_custkey)) AS n_not_exists"""),
  )

  /** SCHEMA-EVOLUTION UNION — the lake reality where yesterday's files
    * lack today's columns: a v1 slice (doc_id, text, lang) unions a v2
    * slice (doc_id, lang, source, n_chars) via unionByName with
    * allowMissingColumns, absent fields padded NULL — then the
    * per-lang null profile audits exactly which generation is missing
    * what. The oracle spells out the padding with explicit NULL casts,
    * so an engine mis-aligning columns by POSITION (the classic union
    * bug this operator exists to avoid) hash-mismatches. */
  val qUnionEvolve: GQuery = GQuery(
    "q_union_evolve",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val v1 = docs.filter($"doc_id" % 2 === 0)
        .select($"doc_id", $"text", $"lang")
      val v2 = docs.filter($"doc_id" % 2 === 1)
        .select($"doc_id", $"lang", $"source", $"n_chars")
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"),
          sum($"text".isNull.cast("long")).as("null_text"),
          sum($"source".isNull.cast("long")).as("null_source"),
          sum(coalesce($"n_chars", lit(0L))).as("v2_chars"))
        .orderBy($"lang")
    },
    Some("""
      WITH u AS (
        SELECT doc_id, text, lang,
               cast(NULL as varchar) AS source, cast(NULL as bigint) AS n_chars
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, cast(NULL as varchar) AS text, lang, source, n_chars
        FROM documents WHERE doc_id % 2 = 1)
      SELECT lang, count(*) AS n_rows,
             cast(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) as bigint)
               AS null_text,
             cast(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) as bigint)
               AS null_source,
             cast(sum(coalesce(n_chars, 0)) as bigint) AS v2_chars
      FROM u GROUP BY lang ORDER BY lang"""),
  )

  /** GROUP BY ALL parity: the SAME modern-SQL text (every non-aggregate
    * select item becomes a grouping key implicitly) runs verbatim in
    * Spark 4 and DuckDB — exercised through the spark.sql entry path
    * rather than the DataFrame DSL, pinning that the engine's SQL
    * surface (not just its Scala API) matches the oracle dialect. The
    * plan is the ordinary partial/final hash aggregate. */
  val qGroupByAll: GQuery = {
    val sql = s"""
      SELECT l_returnflag, l_linestatus,
             count(*) AS n_items,
             ${dsumSql("l_quantity")} AS sum_qty,
             ${dsumSql("l_extendedprice")} AS sum_price
      FROM %s
      GROUP BY ALL
      ORDER BY l_returnflag, l_linestatus"""
    GQuery(
      "q_groupby_all",
      (spark, dir) => {
        Tables.lineitem(spark, dir)
          .createOrReplaceTempView("graft_gball_lineitem")
        spark.sql(sql.format("graft_gball_lineitem"))
      },
      Some(sql.format("lineitem")),
    )
  }

  val all: Seq[GQuery] =
    Seq(qSortLimit, qSetUnion, qSetIntersect, qSetExcept, qSubquery,
      qLateral, qRecursive, qCorrScalar, qSetAll, qNotInNull, qUnionEvolve,
      qGroupByAll)
}
