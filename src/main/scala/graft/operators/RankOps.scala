package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Retrieval-ranking metrics (NDCG@10, MRR) over the brute-force cosine
  * ranking that q_sim_topk established as the engine's retrieval
  * correctness oracle: 10 probe vectors against the rest of the corpus,
  * ranked on the 6dp-ROUNDED cosine with vec_id tiebreak so a 1-ulp
  * engine difference can never flip an order. Relevance is label
  * equality (binary gain) — the labels are noise w.r.t. the vectors, so
  * the metric VALUES are near-chance, but the metric COMPUTATION is
  * exercised end-to-end and is fully deterministic. Per-rank terms
  * (rel/log2(rank+1), 1/first_rank) are identical IEEE doubles in both
  * engines; sums over them are decimal-staged (dsum contract) so
  * accumulation order cannot drift. At 100 TB the probe set is still a
  * broadcast and the only corpus-sized pass is the scored scan; the
  * top-10 cut per probe is a bounded-heap aggregate in spirit — the
  * row_number window partitions on p_id exactly like q_sim_topk.
  */
object RankOps {

  /** Top-10 retrieval per probe: (p_id, c_id, rel, cos_sim, rnk).
    * Probes = vec_id < 10, corpus = the rest (no self-matches). Shared
    * by q_ndcg and q_mrr; the SQL twin below must stay in lockstep. */
  private def rankedTop10(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.DotProduct.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label",
        expr("transform(embedding, x -> cast(x as double))").as("emb"))
      .withColumn("norm", sqrt(expr("dot_product(emb, emb)")))
    val probes = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("p_id"), $"label".as("p_label"),
        $"emb".as("p_emb"), $"norm".as("p_norm"))
    val corpus = emb.filter($"vec_id" >= 10)
      .select($"vec_id".as("c_id"), $"label".as("c_label"),
        $"emb".as("c_emb"), $"norm".as("c_norm"))
    val scored = corpus.crossJoin(broadcast(probes))
      .select($"p_id", $"c_id",
        when($"p_label" === $"c_label", 1L).otherwise(0L).as("rel"),
        r6(expr("dot_product(p_emb, c_emb)") / ($"p_norm" * $"c_norm"))
          .as("cos_sim"))
    val w = Window.partitionBy($"p_id").orderBy($"cos_sim".desc, $"c_id")
    scored.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 10)
  }

  private val rankedTop10Sql: String = """
      WITH emb AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
      scored AS (
        SELECT p.vec_id AS p_id, c.vec_id AS c_id,
               CASE WHEN p.label = c.label THEN 1 ELSE 0 END AS rel,
               floor((list_inner_product(p.e, c.e) /
                 (sqrt(list_inner_product(p.e, p.e)) *
                  sqrt(list_inner_product(c.e, c.e)))) * 1e6 + 0.5) / 1e6
                 AS cos_sim
        FROM emb p CROSS JOIN emb c
        WHERE p.vec_id < 10 AND c.vec_id >= 10),
      ranked10 AS (
        SELECT p_id, c_id, rel, cos_sim, rnk FROM (
          SELECT p_id, c_id, rel, cos_sim,
                 cast(row_number() OVER (PARTITION BY p_id
                   ORDER BY cos_sim DESC, c_id) as int) AS rnk
          FROM scored) t
        WHERE rnk <= 10)"""

  /** NDCG@10 per probe. DCG sums rel/log2(rank+1) over the retrieved
    * order; IDCG re-ranks the same 10 rows by rel desc (rank tiebreak),
    * so NDCG = 1 exactly when all relevant hits sort to the top. Both
    * sums are decimal-staged; log2 of a small-integer double is the same
    * IEEE value in both engines, and the 6dp staging absorbs any final-
    * ulp libm difference. n_rel = 0 yields NULL ndcg (no ideal ranking
    * to normalize by), CASE-guarded identically on both sides. */
  val qNdcg: GQuery = GQuery(
    "q_ndcg",
    (spark, dir) => {
      import spark.implicits._
      val ranked = rankedTop10(spark, dir)
      val wi = Window.partitionBy($"p_id").orderBy($"rel".desc, $"rnk")
      ranked.withColumn("irnk", row_number().over(wi))
        .groupBy($"p_id")
        .agg(
          sum($"rel").cast("int").as("n_rel"),
          dsum($"rel".cast("double") / log2(($"rnk" + 1).cast("double")), 6)
            .as("dcg"),
          dsum($"rel".cast("double") / log2(($"irnk" + 1).cast("double")), 6)
            .as("idcg"))
        .select($"p_id", $"n_rel", $"dcg", $"idcg",
          when($"n_rel" > 0, r6($"dcg" / $"idcg")).as("ndcg"))
        .orderBy($"p_id")
    },
    Some(s"""
      $rankedTop10Sql,
      ideal AS (
        SELECT p_id, rel, rnk,
               cast(row_number() OVER (PARTITION BY p_id
                 ORDER BY rel DESC, rnk) as int) AS irnk
        FROM ranked10),
      agg AS (
        SELECT p_id, cast(sum(rel) as int) AS n_rel,
               ${dsumSql("cast(rel as double) / " +
                 "log2(cast(rnk + 1 as double))", 6)} AS dcg,
               ${dsumSql("cast(rel as double) / " +
                 "log2(cast(irnk + 1 as double))", 6)} AS idcg
        FROM ideal GROUP BY p_id)
      SELECT p_id, n_rel, dcg, idcg,
             CASE WHEN n_rel > 0 THEN ${r6Sql("dcg / idcg")} END AS ndcg
      FROM agg ORDER BY p_id"""),
  )

  /** MEAN RECIPROCAL RANK: per probe, the rank of the first relevant hit
    * within the top-10 (NULL first_rel_rank ⇒ rr = 0), plus the
    * probe-set MRR as a window aggregate over the 10-row probe table —
    * the per-probe rr is 6dp-rounded BEFORE the decimal-staged mean so
    * the headline derives from the published column. */
  val qMrr: GQuery = GQuery(
    "q_mrr",
    (spark, dir) => {
      import spark.implicits._
      val ranked = rankedTop10(spark, dir)
      val firsts = ranked.groupBy($"p_id")
        .agg(min(when($"rel" === 1, $"rnk")).as("fr"))
        .select($"p_id", $"fr".cast("int").as("first_rel_rank"),
          r6(coalesce(lit(1.0) / $"fr".cast("double"), lit(0.0))).as("rr"))
      val wAll = Window.partitionBy()
      firsts
        .withColumn("mrr",
          r6(sum($"rr".cast(DecimalType(30, 6))).over(wAll).cast("double") /
            count(lit(1)).over(wAll).cast("double")))
        .orderBy($"p_id")
    },
    Some(s"""
      $rankedTop10Sql,
      firsts AS (
        SELECT p_id,
               cast(min(CASE WHEN rel = 1 THEN rnk END) as int)
                 AS first_rel_rank
        FROM ranked10 GROUP BY p_id),
      rr AS (
        SELECT p_id, first_rel_rank,
               ${r6Sql("coalesce(cast(1.0 as double) / " +
                 "cast(first_rel_rank as double), cast(0.0 as double))")}
                 AS rr
        FROM firsts)
      SELECT p_id, first_rel_rank, rr,
             ${r6Sql("cast(sum(cast(rr as decimal(30,6))) OVER () as double)" +
               " / cast(count(*) OVER () as double)")} AS mrr
      FROM rr ORDER BY p_id"""),
  )

  val all: Seq[GQuery] = Seq(qNdcg, qMrr)
}
