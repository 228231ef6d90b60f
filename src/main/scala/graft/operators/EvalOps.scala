package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Classifier-evaluation metrics over the heuristic language-ID
  * (q_langid is the single source of truth for predictions, q_prf's
  * precedent): ROC AUC, Cohen's kappa, Matthews correlation, and binned
  * calibration error. Every metric reduces the corpus to INTEGER counts
  * first — a confusion matrix, or per-distinct-score (positives,
  * negatives) pairs — in one combinable groupBy, then evaluates the
  * closed form over a value-bounded table. No ranks over raw rows
  * anywhere: AUC uses the pairwise-count identity on the distinct-score
  * axis, so the only unpartitioned window rides a table bounded by the
  * number of DISTINCT scores (a small rational family s_en/n_tokens),
  * not by corpus size.
  */
object EvalOps {

  /** Continuous score for the binary "is English" task: density of the
    * five English marker stopwords among whitespace tokens. Shared by
    * q_roc_auc and q_ece; the SQL twin must stay textually in lockstep. */
  private def scoredDocs(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        expr("size(filter(split(text, ' '), t -> t IN " +
          "('the', 'and', 'of', 'to', 'in')))").cast("long").as("hits"),
        expr("size(split(text, ' '))").cast("long").as("nt"))
      .select($"doc_id",
        when($"lang" === "en", 1L).otherwise(0L).as("pos"),
        ($"hits".cast("double") / $"nt".cast("double")).as("score"))
  }

  private val scoredDocsSql: String = """
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               cast(len(list_filter(string_split(text, ' '), t -> t IN
                 ('the', 'and', 'of', 'to', 'in'))) as double) /
                 cast(len(string_split(text, ' ')) as double) AS score
        FROM documents"""

  /** ROC AUC of the English-marker-density score against the declared
    * label, via the Mann–Whitney pairwise identity: AUC = (#{pos>neg} +
    * ½#{ties}) / (n₁n₀). The corpus collapses to one row per DISTINCT
    * score carrying integer (np, nn) counts; doubling the numerator
    * (2·wins + ties) keeps every intermediate an exact bigint, so the
    * statistic cannot drift with shuffle order. The cumulative
    * negatives-below window runs on the distinct-score table only — at
    * 100 TB the raw-row pass stays a combinable groupBy and this window
    * still sees a few hundred rows. */
  val qRocAuc: GQuery = GQuery(
    "q_roc_auc",
    (spark, dir) => {
      import spark.implicits._
      val g = scoredDocs(spark, dir)
        .groupBy($"score")
        .agg(sum($"pos").as("np"), sum(lit(1L) - $"pos").as("nn"))
      val wBelow = Window.orderBy($"score")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy()
      g.withColumn("cum_nn", coalesce(sum($"nn").over(wBelow), lit(0L)))
        .withColumn("n1", sum($"np").over(wAll))
        .withColumn("n0", sum($"nn").over(wAll))
        .agg(
          max($"n1").as("n_pos"),
          max($"n0").as("n_neg"),
          sum($"np" * (lit(2L) * $"cum_nn" + $"nn")).as("num2"),
          max($"n1" * $"n0").as("den"))
        .select($"n_pos", $"n_neg",
          r6($"num2".cast("double") /
            (lit(2.0) * $"den".cast("double"))).as("auc"),
          r6($"num2".cast("double") / $"den".cast("double") - lit(1.0))
            .as("gini_coef"))
    },
    Some(s"""
      WITH s AS ($scoredDocsSql),
      g AS (
        SELECT score, cast(sum(pos) as bigint) AS np,
               cast(sum(1 - pos) as bigint) AS nn
        FROM s GROUP BY score),
      c AS (
        SELECT np, nn,
               cast(coalesce(sum(nn) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 as bigint) AS cum_nn,
               cast(sum(np) OVER () as bigint) AS n1,
               cast(sum(nn) OVER () as bigint) AS n0
        FROM g),
      a AS (
        SELECT max(n1) AS n_pos, max(n0) AS n_neg,
               cast(sum(np * (2 * cum_nn + nn)) as bigint) AS num2,
               max(n1 * n0) AS den
        FROM c)
      SELECT n_pos, n_neg,
             ${r6Sql("cast(num2 as double) / " +
               "(cast(2.0 as double) * cast(den as double))")} AS auc,
             ${r6Sql("cast(num2 as double) / cast(den as double) - " +
               "cast(1.0 as double)")} AS gini_coef
      FROM a"""),
  )

  /** COHEN'S KAPPA: chance-corrected agreement between the declared
    * language and the language-ID prediction, over the full ≤36-cell
    * confusion matrix. κ = (N·Σdiag − Σ rowᵢ·colᵢ) / (N² − Σ rowᵢ·colᵢ)
    * keeps numerator and denominator exact bigints; only the final
    * division (and the po/pe report columns) are IEEE doubles. */
  val qKappa: GQuery = GQuery(
    "q_kappa",
    (spark, dir) => {
      import spark.implicits._
      val m = LlmOps.qLangId.run(spark, dir)
        .groupBy($"lang", $"lang_pred")
        .agg(count(lit(1)).as("n"))
      val rowT = m.groupBy($"lang").agg(sum($"n").as("rt"))
      val colT = m.groupBy($"lang_pred".as("lang")).agg(sum($"n").as("ct"))
      val margins = rowT.join(colT, Seq("lang"), "full")
        .agg(sum(coalesce($"rt", lit(0L)) * coalesce($"ct", lit(0L)))
          .as("pe_num"))
      val totals = m.agg(
        sum($"n").as("n_docs"),
        sum(when($"lang" === $"lang_pred", $"n").otherwise(0L)).as("diag"))
      totals.crossJoin(broadcast(margins))
        .select($"n_docs", $"diag",
          r6($"diag".cast("double") / $"n_docs".cast("double")).as("po"),
          r6($"pe_num".cast("double") /
            ($"n_docs" * $"n_docs").cast("double")).as("pe"),
          r6(($"n_docs" * $"diag" - $"pe_num").cast("double") /
            ($"n_docs" * $"n_docs" - $"pe_num").cast("double")).as("kappa"))
    },
    LlmOps.qLangId.oracle.map(inner => s"""
      WITH m AS (
        SELECT lang, lang_pred, count(*) AS n
        FROM ($inner) li GROUP BY lang, lang_pred),
      rt AS (SELECT lang, cast(sum(n) as bigint) AS rt FROM m GROUP BY lang),
      ct AS (SELECT lang_pred AS lang, cast(sum(n) as bigint) AS ct
             FROM m GROUP BY lang_pred),
      mg AS (
        SELECT cast(sum(coalesce(rt.rt, 0) * coalesce(ct.ct, 0)) as bigint)
                 AS pe_num
        FROM rt FULL JOIN ct ON rt.lang = ct.lang),
      tt AS (
        SELECT cast(sum(n) as bigint) AS n_docs,
               cast(sum(CASE WHEN lang = lang_pred THEN n ELSE 0 END)
                 as bigint) AS diag
        FROM m)
      SELECT n_docs, diag,
             ${r6Sql("cast(diag as double) / cast(n_docs as double)")} AS po,
             ${r6Sql("cast(pe_num as double) / " +
               "cast(n_docs * n_docs as double)")} AS pe,
             ${r6Sql("cast(n_docs * diag - pe_num as double) / " +
               "cast(n_docs * n_docs - pe_num as double)")} AS kappa
      FROM tt CROSS JOIN mg"""),
  )

  /** MATTHEWS CORRELATION of the binary "predicted English" decision.
    * The 2×2 cells are one conditional-sum pass over the classifier
    * output; the denominator multiplies the four marginals as
    * √a·√b·√c·√d (each factor cast to double FIRST) because the raw
    * product of four ~n counts overflows bigint at scale while the
    * staged-sqrt form is a fixed IEEE expression. CASE-guarded: a
    * degenerate margin yields NULL, not a crash (ANSI /0). */
  val qMcc: GQuery = GQuery(
    "q_mcc",
    (spark, dir) => {
      import spark.implicits._
      val p = LlmOps.qLangId.run(spark, dir)
        .select(
          when($"lang" === "en", 1L).otherwise(0L).as("y"),
          when($"lang_pred" === "en", 1L).otherwise(0L).as("yh"))
      val c = p.agg(
        sum($"y" * $"yh").as("tp"),
        sum((lit(1L) - $"y") * $"yh").as("fp"),
        sum($"y" * (lit(1L) - $"yh")).as("fn"),
        sum((lit(1L) - $"y") * (lit(1L) - $"yh")).as("tn"))
      val d = (c2: org.apache.spark.sql.Column) => c2.cast("double")
      c.select($"tp", $"fp", $"fn", $"tn",
        r6((d($"tp") + d($"tn")) /
          (d($"tp") + d($"tn") + d($"fp") + d($"fn"))).as("accuracy"),
        r6(when(
          ($"tp" + $"fp") > 0 && ($"tp" + $"fn") > 0 &&
            ($"tn" + $"fp") > 0 && ($"tn" + $"fn") > 0,
          (d($"tp") * d($"tn") - d($"fp") * d($"fn")) /
            (sqrt(d($"tp" + $"fp")) * sqrt(d($"tp" + $"fn")) *
              sqrt(d($"tn" + $"fp")) * sqrt(d($"tn" + $"fn")))))
          .as("mcc"))
    },
    LlmOps.qLangId.oracle.map(inner => s"""
      WITH p AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END AS yh
        FROM ($inner) li),
      c AS (
        SELECT cast(sum(y * yh) as bigint) AS tp,
               cast(sum((1 - y) * yh) as bigint) AS fp,
               cast(sum(y * (1 - yh)) as bigint) AS fn,
               cast(sum((1 - y) * (1 - yh)) as bigint) AS tn
        FROM p)
      SELECT tp, fp, fn, tn,
             ${r6Sql("(cast(tp as double) + cast(tn as double)) / " +
               "(cast(tp as double) + cast(tn as double) + " +
               "cast(fp as double) + cast(fn as double))")} AS accuracy,
             ${r6Sql("CASE WHEN (tp + fp) > 0 AND (tp + fn) > 0 AND " +
               "(tn + fp) > 0 AND (tn + fn) > 0 THEN " +
               "(cast(tp as double) * cast(tn as double) - " +
               "cast(fp as double) * cast(fn as double)) / " +
               "(sqrt(cast(tp + fp as double)) * " +
               "sqrt(cast(tp + fn as double)) * " +
               "sqrt(cast(tn + fp as double)) * " +
               "sqrt(cast(tn + fn as double))) END")} AS mcc
      FROM c"""),
  )

  /** EXPECTED CALIBRATION ERROR of the English-marker score read as a
    * probability: fixed-width score bins (width 0.05, top-clamped), each
    * reporting mean confidence (decimal-staged davg), empirical accuracy
    * (exact integer ratio), and the |acc − conf| gap; the headline ECE
    * is the n-weighted mean of the PRE-ROUNDED gaps so it derives from
    * the published columns. The corpus pass is a single combinable
    * groupBy on the bin key; everything after rides a ≤21-row table. */
  val qEce: GQuery = GQuery(
    "q_ece",
    (spark, dir) => {
      import spark.implicits._
      val b = scoredDocs(spark, dir)
        .select($"pos", $"score",
          least(floor($"score" * lit(20.0)).cast("long"), lit(20L)).as("bin"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"),
          sum($"pos").as("n_pos"),
          davg($"score").as("conf"))
        .withColumn("acc",
          r6($"n_pos".cast("double") / $"n".cast("double")))
        .withColumn("gap", r6(abs($"acc" - $"conf")))
      val wAll = Window.partitionBy()
      b.withColumn("ece",
          r6(sum($"n".cast("double") * $"gap").over(wAll) /
            sum($"n".cast("double")).over(wAll)))
        .select($"bin", $"n", $"n_pos", $"conf", $"acc", $"gap", $"ece")
        .orderBy($"bin")
    },
    Some(s"""
      WITH s AS ($scoredDocsSql),
      b AS (
        SELECT bin, count(*) AS n, cast(sum(pos) as bigint) AS n_pos,
               ${davgSql("score")} AS conf
        FROM (SELECT pos, score,
                     least(cast(floor(score * cast(20.0 as double))
                       as bigint), 20) AS bin
              FROM s) t
        GROUP BY bin),
      g AS (
        SELECT bin, n, n_pos, conf,
               ${r6Sql("cast(n_pos as double) / cast(n as double)")} AS acc
        FROM b),
      h AS (
        SELECT bin, n, n_pos, conf, acc,
               ${r6Sql("abs(acc - conf)")} AS gap
        FROM g)
      SELECT bin, n, n_pos, conf, acc, gap,
             ${r6Sql("sum(cast(n as double) * gap) OVER () / " +
               "sum(cast(n as double)) OVER ()")} AS ece
      FROM h ORDER BY bin"""),
  )

  /** CUMULATIVE GAINS / LIFT curve of the English-marker score: the same
    * fixed-width score bins as q_ece (width 0.05, top-clamped — never an
    * ntile over raw rows), walked from the highest-score bin down.
    * capture = share of all positives reached so far; lift = positive
    * rate so far ÷ base rate. Every ratio is exact-bigint / exact-bigint
    * → one IEEE division → r6, so the curve is bit-stable at any SF and
    * the only windows ride the ≤21-row bin table. */
  val qGains: GQuery = GQuery(
    "q_gains",
    (spark, dir) => {
      import spark.implicits._
      val b = scoredDocs(spark, dir)
        .select($"pos",
          least(floor($"score" * lit(20.0)).cast("long"), lit(20L)).as("bin"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"))
      val wDesc = Window.orderBy($"bin".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      b.withColumn("cum_n", sum($"n").over(wDesc))
        .withColumn("cum_pos", sum($"n_pos").over(wDesc))
        .withColumn("tot_n", sum($"n").over(wAll))
        .withColumn("tot_pos", sum($"n_pos").over(wAll))
        .select($"bin", $"n", $"n_pos", $"cum_n", $"cum_pos",
          r6(d($"cum_pos") / d($"tot_pos")).as("capture"),
          r6((d($"cum_pos") / d($"cum_n")) /
            (d($"tot_pos") / d($"tot_n"))).as("lift"))
        .orderBy($"bin".desc)
    },
    Some(s"""
      WITH s AS ($scoredDocsSql),
      b AS (
        SELECT bin, count(*) AS n, cast(sum(pos) as bigint) AS n_pos
        FROM (SELECT pos,
                     least(cast(floor(score * cast(20.0 as double))
                       as bigint), 20) AS bin
              FROM s) t
        GROUP BY bin),
      c AS (
        SELECT bin, n, n_pos,
               cast(sum(n) OVER (ORDER BY bin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 as bigint) AS cum_n,
               cast(sum(n_pos) OVER (ORDER BY bin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 as bigint) AS cum_pos,
               cast(sum(n) OVER () as bigint) AS tot_n,
               cast(sum(n_pos) OVER () as bigint) AS tot_pos
        FROM b)
      SELECT bin, n, n_pos, cum_n, cum_pos,
             ${r6Sql("cast(cum_pos as double) / cast(tot_pos as double)")}
               AS capture,
             ${r6Sql("(cast(cum_pos as double) / cast(cum_n as double)) / " +
               "(cast(tot_pos as double) / cast(tot_n as double))")} AS lift
      FROM c ORDER BY bin DESC"""),
  )

  /** BRIER SCORE + Murphy decomposition of the English-marker score read
    * as a probability. The headline Brier is a decimal-staged corpus
    * mean of (score − y)²; reliability and resolution re-derive from the
    * q_ece bins' PRE-ROUNDED per-bin (conf, acc) columns — 6dp-rounded
    * doubles, so the n-weighted squared-gap sums decimal-stage exactly —
    * and uncertainty is ȳ(1−ȳ) from the rounded base rate. One
    * combinable corpus pass + one ≤21-row bin table crossJoined via
    * broadcast (qKappa's precedent). */
  val qBrier: GQuery = GQuery(
    "q_brier",
    (spark, dir) => {
      import spark.implicits._
      val s = scoredDocs(spark, dir)
      val overall = s.agg(
        count(lit(1)).as("n_docs"),
        sum($"pos").as("tot_pos"),
        davg(($"score" - $"pos".cast("double")) *
          ($"score" - $"pos".cast("double")), 6).as("brier"))
      val bins = s
        .select($"pos", $"score",
          least(floor($"score" * lit(20.0)).cast("long"), lit(20L)).as("bin"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"),
          davg($"score").as("conf"))
        .withColumn("acc",
          r6($"n_pos".cast("double") / $"n".cast("double")))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      bins.crossJoin(broadcast(overall))
        .withColumn("ybar", r6(d($"tot_pos") / d($"n_docs")))
        .agg(
          max($"n_docs").as("n_docs"),
          max($"brier").as("brier"),
          max(r6($"ybar" * (lit(1.0) - $"ybar"))).as("uncertainty"),
          rN(sum((d($"n") * ($"conf" - $"acc") * ($"conf" - $"acc"))
            .cast(org.apache.spark.sql.types.DecimalType(30, 6)))
            .cast("double") / max(d($"n_docs")), 6).as("reliability"),
          rN(sum((d($"n") * ($"acc" - $"ybar") * ($"acc" - $"ybar"))
            .cast(org.apache.spark.sql.types.DecimalType(30, 6)))
            .cast("double") / max(d($"n_docs")), 6).as("resolution"))
    },
    Some(s"""
      WITH s AS ($scoredDocsSql),
      o AS (
        SELECT count(*) AS n_docs, cast(sum(pos) as bigint) AS tot_pos,
               ${davgSql("(score - cast(pos as double)) * " +
                 "(score - cast(pos as double))", 6)} AS brier
        FROM s),
      b AS (
        SELECT bin, count(*) AS n, cast(sum(pos) as bigint) AS n_pos,
               ${davgSql("score")} AS conf
        FROM (SELECT pos, score,
                     least(cast(floor(score * cast(20.0 as double))
                       as bigint), 20) AS bin
              FROM s) t
        GROUP BY bin),
      g AS (
        SELECT bin, n, n_pos, conf,
               ${r6Sql("cast(n_pos as double) / cast(n as double)")} AS acc
        FROM b),
      j AS (
        SELECT g.*, o.n_docs, o.tot_pos, o.brier,
               ${r6Sql("cast(o.tot_pos as double) / " +
                 "cast(o.n_docs as double)")} AS ybar
        FROM g CROSS JOIN o)
      SELECT max(n_docs) AS n_docs, max(brier) AS brier,
             max(${r6Sql("ybar * (cast(1.0 as double) - ybar)")})
               AS uncertainty,
             ${rNSql("cast(sum(cast(cast(n as double) * (conf - acc) * " +
               "(conf - acc) as decimal(30,6))) as double) / " +
               "max(cast(n_docs as double))", 6)} AS reliability,
             ${rNSql("cast(sum(cast(cast(n as double) * (acc - ybar) * " +
               "(acc - ybar) as decimal(30,6))) as double) / " +
               "max(cast(n_docs as double))", 6)} AS resolution
      FROM j"""),
  )

  /** PRECISION–RECALL CURVE at five operating thresholds for the
    * English-marker score — the metric that matters when positives are
    * the minority and ROC flatters (complements q_roc_auc/q_gains).
    * The corpus collapses to the distinct-score (np, nn) table first
    * (the q_roc_auc posture); the ×5 threshold explode runs on THAT,
    * and each point is two conditional integer sums. Thresholds are
    * cast-double literals compared against the identically-computed
    * score — no ulp membership flips. */
  val qPrCurve: GQuery = GQuery(
    "q_pr_curve",
    (spark, dir) => {
      import spark.implicits._
      val g = scoredDocs(spark, dir)
        .groupBy($"score")
        .agg(sum($"pos").as("np"), sum(lit(1L) - $"pos").as("nn"))
      val pts = g.select($"score", $"np", $"nn",
          explode(array(lit(0.02), lit(0.04), lit(0.06), lit(0.08),
            lit(0.10))).as("tau"))
        .groupBy($"tau")
        .agg(sum(when($"score" >= $"tau", $"np").otherwise(0L)).as("tp"),
          sum(when($"score" >= $"tau", $"nn").otherwise(0L)).as("fp"),
          sum(when($"score" < $"tau", $"np").otherwise(0L)).as("fn"))
      val d = (c: String) => col(c).cast("double")
      val prec = d("tp") / (d("tp") + d("fp"))
      val rec = d("tp") / (d("tp") + d("fn"))
      pts.select(r6($"tau").as("tau"), $"tp", $"fp", $"fn",
          r6(prec).as("precision"), r6(rec).as("recall"),
          r6(lit(2.0) * prec * rec / (prec + rec)).as("f1"))
        .orderBy($"tau")
    },
    Some {
      val prec = "(cast(tp as double) / (cast(tp as double) + " +
        "cast(fp as double)))"
      val rec = "(cast(tp as double) / (cast(tp as double) + " +
        "cast(fn as double)))"
      s"""
      WITH s AS ($scoredDocsSql),
      g AS (
        SELECT score, cast(sum(pos) as bigint) AS np,
               cast(sum(1 - pos) as bigint) AS nn
        FROM s GROUP BY score),
      pts AS (
        SELECT tau,
               cast(sum(CASE WHEN score >= tau THEN np ELSE 0 END)
                 as bigint) AS tp,
               cast(sum(CASE WHEN score >= tau THEN nn ELSE 0 END)
                 as bigint) AS fp,
               cast(sum(CASE WHEN score < tau THEN np ELSE 0 END)
                 as bigint) AS fn
        FROM g, (SELECT unnest([cast(0.02 as double), cast(0.04 as double),
                   cast(0.06 as double), cast(0.08 as double),
                   cast(0.10 as double)]) AS tau) ts
        GROUP BY tau)
      SELECT ${r6Sql("tau")} AS tau, tp, fp, fn,
             ${r6Sql(prec)} AS precision,
             ${r6Sql(rec)} AS recall,
             ${r6Sql(s"cast(2.0 as double) * $prec * $rec / " +
               s"($prec + $rec)")} AS f1
      FROM pts ORDER BY tau"""
    },
  )

  /** DELONG standard error and 95% CI for q_roc_auc's AUC — the
    * inferential companion (is 0.74 distinguishable from 0.5?).
    * Placement values come straight from the COLLAPSED distinct-score
    * table: a positive at score s has V₁₀ = (#neg below + ½#neg at)/n₀
    * and a negative V₀₁ = (#pos above + ½#pos at)/n₁ — each ONE IEEE
    * division of exact int64 counts (doubled to keep the ½ exact), so
    * the per-score placement is deterministic; their count-weighted
    * first/second moments are 12-dp decimal-staged (terms ≤ 1).
    * Var(AUC) = S₁₀/n₁ + S₀₁/n₀ with the n−1 variance denominators. */
  val qAucDelong: GQuery = GQuery(
    "q_auc_delong",
    (spark, dir) => {
      import spark.implicits._
      val dec12 = org.apache.spark.sql.types.DecimalType(30, 12)
      val g = scoredDocs(spark, dir)
        .groupBy($"score")
        .agg(sum($"pos").as("np"), sum(lit(1L) - $"pos").as("nn"))
      val wBelow = Window.orderBy($"score")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy()
      val c = g
        .withColumn("cum_nn", coalesce(sum($"nn").over(wBelow), lit(0L)))
        .withColumn("cum_np", coalesce(sum($"np").over(wBelow), lit(0L)))
        .withColumn("n1", sum($"np").over(wAll))
        .withColumn("n0", sum($"nn").over(wAll))
      // doubled placements stay exact int64; one division each
      val v10 = ((lit(2L) * $"cum_nn" + $"nn").cast("double") /
        (lit(2L) * $"n0").cast("double"))
      val v01 = ((lit(2L) * ($"n1" - $"cum_np" - $"np") + $"np")
        .cast("double") / (lit(2L) * $"n1").cast("double"))
      val a = c.agg(
        max($"n1").as("n_pos"), max($"n0").as("n_neg"),
        sum(rN($"np".cast("double") * v10, 12).cast(dec12))
          .cast("double").as("s10"),
        sum(rN($"np".cast("double") * v10 * v10, 12).cast(dec12))
          .cast("double").as("q10"),
        sum(rN($"nn".cast("double") * v01, 12).cast(dec12))
          .cast("double").as("s01"),
        sum(rN($"nn".cast("double") * v01 * v01, 12).cast(dec12))
          .cast("double").as("q01"))
      val n1D = $"n_pos".cast("double")
      val n0D = $"n_neg".cast("double")
      val auc = $"s10" / n1D
      val var10 = ($"q10" - $"s10" * $"s10" / n1D) / (n1D - lit(1.0))
      val var01 = ($"q01" - $"s01" * $"s01" / n0D) / (n0D - lit(1.0))
      val se = sqrt(var10 / n1D + var01 / n0D)
      a.select($"n_pos", $"n_neg", r6(auc).as("auc"),
        r6(se).as("se_delong"),
        r6(auc - lit(1.96) * se).as("ci_lo"),
        r6(auc + lit(1.96) * se).as("ci_hi"))
    },
    Some {
      val v10 = "(cast(2 * cum_nn + nn as double) / " +
        "cast(2 * n0 as double))"
      val v01 = "(cast(2 * (n1 - cum_np - np) + np as double) / " +
        "cast(2 * n1 as double))"
      s"""
      WITH s AS ($scoredDocsSql),
      g AS (
        SELECT score, cast(sum(pos) as bigint) AS np,
               cast(sum(1 - pos) as bigint) AS nn
        FROM s GROUP BY score),
      c AS (
        SELECT np, nn,
               cast(coalesce(sum(nn) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 as bigint) AS cum_nn,
               cast(coalesce(sum(np) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 as bigint) AS cum_np,
               cast(sum(np) OVER () as bigint) AS n1,
               cast(sum(nn) OVER () as bigint) AS n0
        FROM g),
      a AS (
        SELECT max(n1) AS n_pos, max(n0) AS n_neg,
               cast(sum(cast(${rNSql(
                 s"cast(np as double) * $v10", 12)} as decimal(30,12)))
                 as double) AS s10,
               cast(sum(cast(${rNSql(
                 s"cast(np as double) * $v10 * $v10", 12)}
                 as decimal(30,12))) as double) AS q10,
               cast(sum(cast(${rNSql(
                 s"cast(nn as double) * $v01", 12)} as decimal(30,12)))
                 as double) AS s01,
               cast(sum(cast(${rNSql(
                 s"cast(nn as double) * $v01 * $v01", 12)}
                 as decimal(30,12))) as double) AS q01
        FROM c),
      f AS (
        SELECT n_pos, n_neg,
               s10 / cast(n_pos as double) AS auc,
               sqrt((q10 - s10 * s10 / cast(n_pos as double)) /
                 (cast(n_pos as double) - cast(1.0 as double)) /
                 cast(n_pos as double) +
                 (q01 - s01 * s01 / cast(n_neg as double)) /
                 (cast(n_neg as double) - cast(1.0 as double)) /
                 cast(n_neg as double)) AS se
        FROM a)
      SELECT n_pos, n_neg, ${r6Sql("auc")} AS auc,
             ${r6Sql("se")} AS se_delong,
             ${r6Sql("auc - cast(1.96 as double) * se")} AS ci_lo,
             ${r6Sql("auc + cast(1.96 as double) * se")} AS ci_hi
      FROM f"""
    },
  )

  val all: Seq[GQuery] =
    Seq(qRocAuc, qKappa, qMcc, qEce, qGains, qBrier, qPrCurve, qAucDelong)
}
