package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Distribution, text-distribution, and graph statistics (SURVEY.md §2.B
  * extension, round 7): two-sample Kolmogorov–Smirnov, winsorized robust
  * means, lexical diversity, Zipf-slope fitting, and triangle counting.
  * Scale posture: every query collapses its fact to a bounded
  * intermediate first — distinct values for KS, (group, token) counts
  * for the text statistics, a support-thresholded edge list for the
  * graph — so the exact passes downstream run over group-count- or
  * vocabulary-bounded inputs, not raw rows.
  */
object StatOps {

  /** Two-sample Kolmogorov–Smirnov statistic between the 1995 order-value
    * distributions of URGENT vs LOW priority orders: D = max over values
    * of |F1(v) − F2(v)|, located exactly. The fact collapses to per-
    * distinct-value counts first (combinable groupBy — the only pass
    * that sees raw rows); the ECDFs are integer running sums over that
    * value-bounded table. The unpartitioned cumulative window is the
    * inherent exact-KS shape; at 100 TB the same plan runs per
    * COMPARISON CELL (partitionBy the cell key), or the value axis is
    * pre-binned — both documented alternatives keep this query's
    * integer-count determinism. The argmax row carries a total (D desc,
    * value asc) tiebreak. */
  val qKsTest: GQuery = GQuery(
    "q_ks_test",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
        .filter(year($"o_orderdate") === 1995 &&
          $"o_orderpriority".isin("1-URGENT", "5-LOW"))
        .select($"o_totalprice".as("v"), $"o_orderpriority".as("pri"))
      val g = o.groupBy($"v")
        .agg(sum(when($"pri" === "1-URGENT", 1L).otherwise(0L)).as("c1"),
          sum(when($"pri" === "5-LOW", 1L).otherwise(0L)).as("c2"))
      val wc = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy()
      g.withColumn("r1", sum($"c1").over(wc))
        .withColumn("r2", sum($"c2").over(wc))
        .withColumn("n1", sum($"c1").over(wAll))
        .withColumn("n2", sum($"c2").over(wAll))
        .withColumn("d", r6(abs($"r1".cast("double") / $"n1" -
          $"r2".cast("double") / $"n2")))
        .orderBy($"d".desc, $"v")
        .limit(1)
        .select($"n1", $"n2", $"d".as("ks_d"), $"v".as("at_value"))
    },
    Some(s"""
      WITH o AS (
        SELECT o_totalprice AS v, o_orderpriority AS pri
        FROM orders
        WHERE year(o_orderdate) = 1995
          AND o_orderpriority IN ('1-URGENT', '5-LOW')),
      g AS (
        SELECT v,
               cast(sum(CASE WHEN pri = '1-URGENT' THEN 1 ELSE 0 END)
                 as bigint) AS c1,
               cast(sum(CASE WHEN pri = '5-LOW' THEN 1 ELSE 0 END)
                 as bigint) AS c2
        FROM o GROUP BY v),
      c AS (
        SELECT v,
               cast(sum(c1) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 as bigint) AS r1,
               cast(sum(c2) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 as bigint) AS r2,
               cast(sum(c1) OVER () as bigint) AS n1,
               cast(sum(c2) OVER () as bigint) AS n2
        FROM g)
      SELECT n1, n2,
             ${r6Sql("abs(cast(r1 as double) / n1 - " +
               "cast(r2 as double) / n2)")} AS ks_d,
             v AS at_value
      FROM c
      ORDER BY ${r6Sql("abs(cast(r1 as double) / n1 - " +
        "cast(r2 as double) / n2)")} DESC, v
      LIMIT 1"""),
  )

  /** Winsorized and raw means of l_quantity per return flag — the robust
    * location estimate that caps (rather than drops) the tails at
    * p05/p95. The per-group percentile bounds come from the SAME scan
    * via windowed aggregates (partitionBy flag) — not a separate
    * aggregate branch joined back, which would scan the fact twice (the
    * Q15 trap); clipping and the decimal-staged means then ride the one
    * pass. percentile ≡ quantile_cont bit-wise (q_percentile contract);
    * at 100 TB the GK sketch swaps in unchanged (GkSwapSpec). */
  val qWinsorize: GQuery = GQuery(
    "q_winsorize",
    (spark, dir) => {
      import spark.implicits._
      val wg = Window.partitionBy($"l_returnflag")
      Tables.lineitem(spark, dir)
        .select($"l_returnflag", $"l_quantity")
        .withColumn("lo", expr("percentile(l_quantity, 0.05)").over(wg))
        .withColumn("hi", expr("percentile(l_quantity, 0.95)").over(wg))
        .withColumn("clipped", least(greatest($"l_quantity", $"lo"), $"hi"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(min($"lo"), 6).as("p05"),
          round(min($"hi"), 6).as("p95"),
          davg($"l_quantity", 6).as("mean_raw"),
          davg($"clipped", 6).as("mean_winsor"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      WITH w AS (
        SELECT l_returnflag, l_quantity,
               quantile_cont(l_quantity, 0.05)
                 OVER (PARTITION BY l_returnflag) AS lo,
               quantile_cont(l_quantity, 0.95)
                 OVER (PARTITION BY l_returnflag) AS hi
        FROM lineitem)
      SELECT l_returnflag, count(*) AS n,
             round(min(lo), 6) AS p05,
             round(min(hi), 6) AS p95,
             ${davgSql("l_quantity", 6)} AS mean_raw,
             ${davgSql("least(greatest(l_quantity, lo), hi)", 6)}
               AS mean_winsor
      FROM w GROUP BY l_returnflag ORDER BY l_returnflag"""),
  )

  /** Lexical diversity per document source: type-token ratio and Simpson
    * diversity (1 − Σf(f−1)/(N(N−1)) — the probability two sampled
    * tokens differ). One explode into a combinable (source, token)
    * count, one combinable per-source rollup; every statistic is an
    * exact integer until the final division. The corpus-health gauge
    * that catches a source collapsing into boilerplate (diversity drops
    * long before exact dedup fires). */
  val qDiversity: GQuery = GQuery(
    "q_diversity",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"source", explode(split($"text", " ")).as("tok"))
        .groupBy($"source", $"tok")
        .agg(count(lit(1)).as("c"))
        .groupBy($"source")
        .agg(count(lit(1)).as("vocab"), sum($"c").as("n_tokens"),
          sum($"c" * ($"c" - 1)).as("rep"))
        .select($"source", $"vocab", $"n_tokens",
          r6(lit(1.0) - $"rep".cast("double") /
            ($"n_tokens".cast("double") * ($"n_tokens" - 1).cast("double")))
            .as("simpson"),
          r6($"vocab".cast("double") / $"n_tokens").as("ttr"))
        .orderBy($"source")
    },
    Some(s"""
      WITH c AS (
        SELECT source, tok, count(*) AS c FROM (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents) t0
        GROUP BY source, tok),
      s AS (
        SELECT source, count(*) AS vocab,
               cast(sum(c) as bigint) AS n_tokens,
               cast(sum(c * (c - 1)) as bigint) AS rep
        FROM c GROUP BY source)
      SELECT source, vocab, n_tokens,
             ${r6Sql("cast(1.0 as double) - cast(rep as double) / " +
               "(cast(n_tokens as double) * cast(n_tokens - 1 as double))")}
               AS simpson,
             ${r6Sql("cast(vocab as double) / n_tokens")} AS ttr
      FROM s ORDER BY source"""),
  )

  /** Zipf-slope fit of the corpus term-frequency distribution: least-
    * squares slope of ln(freq) on ln(rank) over the full vocabulary —
    * the one-number summary of whether a corpus has natural long-tail
    * token statistics (≈ −1) or degenerate ones. Term counts are one
    * combinable groupBy; ranking is a window over the VOCABULARY-sized
    * count table (bounded at any corpus scale); the regression runs on
    * per-term contributions IEEE-rounded at 6dp and decimal-summed —
    * the same cross-engine ln() + dsum contract as q_entropy/q_tfidf.
    * Rank ties break on the token string, so ranks are total. */
  val qZipf: GQuery = GQuery(
    "q_zipf",
    (spark, dir) => {
      import spark.implicits._
      val tf = Tables.documents(spark, dir)
        .select(explode(split($"text", " ")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("f"))
      val r = tf.withColumn("rank",
        row_number().over(Window.orderBy($"f".desc, $"tok")))
      val terms = r.select(
        rN(log($"rank".cast("double")), 6).as("x"),
        rN(log($"f".cast("double")), 6).as("y"))
        .select($"x", $"y", rN($"x" * $"y", 6).as("xy"),
          rN($"x" * $"x", 6).as("xx"))
      val s = terms.agg(count(lit(1)).cast("double").as("n"),
        dsum($"x", 6).as("sx"), dsum($"y", 6).as("sy"),
        dsum($"xy", 6).as("sxy"), dsum($"xx", 6).as("sxx"))
      s.select($"n".cast("long").as("n_terms"),
        r6(($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx")).as("slope"),
        r6(($"sy" - ($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n").as("intercept"))
    },
    Some(s"""
      WITH tf AS (
        SELECT tok, count(*) AS f FROM (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t0
        GROUP BY tok),
      r AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rank
        FROM tf),
      t AS (
        SELECT ${rNSql("ln(cast(rank as double))", 6)} AS x,
               ${rNSql("ln(cast(f as double))", 6)} AS y
        FROM r),
      t2 AS (
        SELECT x, y, ${rNSql("x * y", 6)} AS xy, ${rNSql("x * x", 6)} AS xx
        FROM t),
      s AS (
        SELECT cast(count(*) as double) AS n,
               ${dsumSql("x", 6)} AS sx, ${dsumSql("y", 6)} AS sy,
               ${dsumSql("xy", 6)} AS sxy, ${dsumSql("xx", 6)} AS sxx
        FROM t2)
      SELECT cast(n as bigint) AS n_terms,
             ${r6Sql("(n*sxy - sx*sy) / (n*sxx - sx*sx)")} AS slope,
             ${r6Sql("(sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n")}
               AS intercept
      FROM s"""),
  )

  /** Triangle counting over the co-purchase graph: edges are part pairs
    * co-purchased in ≥ 2 distinct orders (the same order-key-bounded
    * pair generation as q_copurchase — fan-out is lines-per-order, never
    * part×part), stored once per pair as (a < b); triangles close via
    * two equi-joins on the canonical orientation (a<b<c visits each
    * triangle exactly once). The support floor is what bounds the edge
    * list (1.2M raw pairs → 3.6k edges at sf0.1); at 1000× add degree-
    * ordered orientation so no high-degree vertex anchors a quadratic
    * wedge set — the join shape is unchanged. A planted 4-clique on
    * synthetic part ids keeps the output non-vacuous at every SF (the
    * shifted-union convention of the dedup queries). */
  val qTriangles: GQuery = GQuery(
    "q_triangles",
    (spark, dir) => {
      import spark.implicits._
      val lp = Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_partkey").distinct()
      val organic = lp.as("a").join(lp.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .agg(count(lit(1)).as("s"))
        .filter($"s" >= 2)
        .select($"pa", $"pb")
      val k4 = Seq(9000001L, 9000002L, 9000003L, 9000004L)
      val planted = k4.combinations(2).map { case Seq(x, y) => (x, y) }
        .toSeq.toDF("pa", "pb")
      val e = organic.unionByName(planted)
      e.as("x").join(e.as("y"), col("x.pb") === col("y.pa"))
        .join(e.as("z"),
          col("z.pa") === col("x.pa") && col("z.pb") === col("y.pb"))
        .select(col("x.pa").as("a"), col("x.pb").as("b"),
          col("y.pb").as("c"))
        .orderBy($"a", $"b", $"c")
    },
    Some("""
      WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      organic AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lp a JOIN lp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      planted AS (
        SELECT cast(pa as bigint) AS pa, cast(pb as bigint) AS pb
        FROM (VALUES (9000001, 9000002), (9000001, 9000003),
                     (9000001, 9000004), (9000002, 9000003),
                     (9000002, 9000004), (9000003, 9000004)) v(pa, pb)),
      e AS (SELECT pa, pb FROM organic UNION ALL SELECT pa, pb FROM planted)
      SELECT x.pa AS a, x.pb AS b, y.pb AS c
      FROM e x JOIN e y ON x.pb = y.pa
               JOIN e z ON z.pa = x.pa AND z.pb = y.pb
      ORDER BY a, b, c"""),
  )

  val all: Seq[GQuery] = Seq(
    qKsTest, qWinsorize, qDiversity, qZipf, qTriangles)
}
