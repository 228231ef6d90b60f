package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Market-basket analytics: directed association rules and item-item
  * cosine neighbors over order baskets at BRAND granularity. Brand is the
  * deliberate scale choice: the basket table collapses to DISTINCT
  * (order, brand) first — combinable, bounded by |orders|·|brands| — and
  * every pair join fans out at most |brands|² = 625 combinations per
  * order, so the explode can never follow fact-table skew (the
  * q_bipartite_proj rule; q_copurchase covers the part-granularity lift
  * variant with an explicit small-parts guard).
  */
object RecOps {

  /** DIRECTED ASSOCIATION RULES a→b over order baskets: support
    * co/N, confidence co/n_a, lift co·N/(n_a·n_b). The undirected
    * co-occurrence table (one self equi-join ON ORDER of the distinct
    * basket table, a<b) is emitted in BOTH directions by a union — a
    * rule and its converse share co but not confidence. Top 30 by
    * (lift, confidence, antecedent, consequent) — a total order, so
    * the limit is deterministic at every SF. */
  val qAssocRules: GQuery = GQuery(
    "q_assoc_rules",
    (spark, dir) => {
      import spark.implicits._
      // ONE scan of the fact: per-order brand sets (collect_set dedups),
      // checkpointed for the three consumers (pair explode, per-brand
      // support, order total) — the basket self-join form scanned
      // lineitem three times (measured 1.7s -> ~0.9s at sf0.1)
      val sets = Tables.lineitem(spark, dir)
        .join(broadcast(Tables.part(spark, dir)),
          $"l_partkey" === $"p_partkey")
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"p_brand")).as("bs"))
        .localCheckpoint()
      val supp = sets.select(explode($"bs").as("b"))
        .groupBy($"b").agg(count(lit(1)).as("n"))
      val tot = sets.agg(count(lit(1)).as("nn"))
      val co = sets.filter(size($"bs") >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(bs)-1), i -> " +
            "transform(sequence(i+1, size(bs)), j -> " +
            "struct(element_at(bs, i) as a, element_at(bs, j) as b))))"))
          .as("pr"))
        .groupBy($"pr.a".as("a"), $"pr.b".as("b"))
        .agg(count(lit(1)).as("co"))
      val directed = co.unionByName(
        co.select($"b".as("a"), $"a".as("b"), $"co"))
      directed
        .join(broadcast(supp.select($"b".as("a"), $"n".as("na"))), "a")
        .join(broadcast(supp.select($"b", $"n".as("nb"))), "b")
        .crossJoin(broadcast(tot))
        .select($"a".as("antecedent"), $"b".as("consequent"), $"co",
          r6($"co".cast("double") / $"nn".cast("double")).as("support"),
          r6($"co".cast("double") / $"na".cast("double")).as("confidence"),
          r6($"co".cast("double") * $"nn".cast("double") /
            ($"na".cast("double") * $"nb".cast("double"))).as("lift"))
        .orderBy($"lift".desc, $"confidence".desc,
          $"antecedent", $"consequent")
        .limit(30)
    },
    Some(s"""
      WITH basket AS (
        SELECT DISTINCT l_orderkey AS o, p_brand AS b
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      supp AS (SELECT b, count(*) AS n FROM basket GROUP BY b),
      tot AS (SELECT count(DISTINCT o) AS nn FROM basket),
      co AS (
        SELECT x.b AS a, y.b AS b, count(*) AS co
        FROM basket x JOIN basket y ON x.o = y.o AND x.b < y.b
        GROUP BY 1, 2),
      directed AS (
        SELECT a, b, co FROM co
        UNION ALL SELECT b AS a, a AS b, co FROM co)
      SELECT d.a AS antecedent, d.b AS consequent,
             cast(d.co as bigint) AS co,
             ${r6Sql("cast(d.co as double) / cast(nn as double)")}
               AS support,
             ${r6Sql("cast(d.co as double) / cast(sa.n as double)")}
               AS confidence,
             ${r6Sql("cast(d.co as double) * cast(nn as double) / " +
               "(cast(sa.n as double) * cast(sb.n as double))")} AS lift
      FROM directed d
      JOIN supp sa ON sa.b = d.a
      JOIN supp sb ON sb.b = d.b
      CROSS JOIN tot
      ORDER BY lift DESC, confidence DESC, antecedent, consequent
      LIMIT 30"""),
  )

  /** ITEM-ITEM COSINE NEIGHBORS — the classic collaborative-filter
    * similarity sim(a,b) = co/√(n_a·n_b) over the binary order×brand
    * matrix, top-3 neighbors per brand. Same bounded basket/co tables
    * as q_assoc_rules; the per-key top-k is a row_number window over
    * the ≤600-row directed pair table with a (sim desc, neighbor asc)
    * total order. √ is IEEE-correctly-rounded in both engines, so no
    * staging is needed beyond the final r6. */
  val qItemsim: GQuery = GQuery(
    "q_itemsim",
    (spark, dir) => {
      import spark.implicits._
      // same single-scan basket collapse as q_assoc_rules
      val sets = Tables.lineitem(spark, dir)
        .join(broadcast(Tables.part(spark, dir)),
          $"l_partkey" === $"p_partkey")
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"p_brand")).as("bs"))
        .localCheckpoint()
      val supp = sets.select(explode($"bs").as("b"))
        .groupBy($"b").agg(count(lit(1)).as("n"))
      val co = sets.filter(size($"bs") >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(bs)-1), i -> " +
            "transform(sequence(i+1, size(bs)), j -> " +
            "struct(element_at(bs, i) as a, element_at(bs, j) as b))))"))
          .as("pr"))
        .groupBy($"pr.a".as("a"), $"pr.b".as("b"))
        .agg(count(lit(1)).as("co"))
      val directed = co.unionByName(
        co.select($"b".as("a"), $"a".as("b"), $"co"))
      val sims = directed
        .join(broadcast(supp.select($"b".as("a"), $"n".as("na"))), "a")
        .join(broadcast(supp.select($"b", $"n".as("nb"))), "b")
        .select($"a".as("brand"), $"b".as("neighbor"),
          r6($"co".cast("double") /
            sqrt(($"na" * $"nb").cast("double"))).as("cosine"))
      sims
        .withColumn("rk", row_number().over(
          Window.partitionBy($"brand")
            .orderBy($"cosine".desc, $"neighbor")).cast("int"))
        .filter($"rk" <= 3)
        .orderBy($"brand", $"rk")
    },
    Some(s"""
      WITH basket AS (
        SELECT DISTINCT l_orderkey AS o, p_brand AS b
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      supp AS (SELECT b, count(*) AS n FROM basket GROUP BY b),
      co AS (
        SELECT x.b AS a, y.b AS b, count(*) AS co
        FROM basket x JOIN basket y ON x.o = y.o AND x.b < y.b
        GROUP BY 1, 2),
      directed AS (
        SELECT a, b, co FROM co
        UNION ALL SELECT b AS a, a AS b, co FROM co),
      sims AS (
        SELECT d.a AS brand, d.b AS neighbor,
               ${r6Sql("cast(d.co as double) / " +
                 "sqrt(cast(sa.n * sb.n as double))")} AS cosine
        FROM directed d
        JOIN supp sa ON sa.b = d.a
        JOIN supp sb ON sb.b = d.b),
      rk AS (
        SELECT brand, neighbor, cosine,
               cast(row_number() OVER (PARTITION BY brand
                 ORDER BY cosine DESC, neighbor) as int) AS rk
        FROM sims)
      SELECT brand, neighbor, cosine, rk
      FROM rk WHERE rk <= 3 ORDER BY brand, rk"""),
  )

  val all: Seq[GQuery] = Seq(qAssocRules, qItemsim)
}
