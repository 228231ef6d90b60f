package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Experimentation / causal-inference operators: CUPED variance
  * reduction, difference-in-differences, and a Granger-style lead-lag
  * predictive test. Scale posture (shared with InferOps/NonparamOps):
  * the raw fact collapses FIRST onto its natural coarse key (user, day,
  * group-cell) via one map-side-combinable pass of EXACT integer
  * moments (counts / integer cents), so everything downstream runs over
  * a user-count- or calendar-bounded table and the only floating point
  * is a fixed IEEE closed form over exact integers — order-free, hence
  * bit-identical on a 1000-executor cluster and in the DuckDB oracle.
  */
object CausalOps {

  /** CUPED (Controlled-experiment Using Pre-Experiment Data): the
    * industry-standard variance-reduction estimator for A/B tests.
    * Users are hash-split 50/50 (md5 — the cross-engine stable split,
    * CLAUDE.md idiom); the covariate X is each user's first-15-day
    * spend, the metric Y the remaining days' spend, both as exact
    * integer cents from ONE per-user pass. θ = cov(X,Y)/var(X) is
    * computed from pooled integer moments, and the adjusted per-variant
    * mean is the closed form Ȳ_v − θ(X̄_v − X̄) — no per-row second
    * pass. ρ² (the achieved variance reduction) rides the same moments.
    * The N·Sxy-style products are formed in DOUBLE after the exact
    * bigint moments (each moment fits int64 at any SF; their products
    * would not) — IEEE on exact inputs, so still deterministic. */
  val qCuped: GQuery = GQuery(
    "q_cuped",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select(to_date($"ts").as("day"), $"user_id",
          floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      val b = ev.agg(min($"day").as("d0"))
      val u = ev.crossJoin(broadcast(b))
        .groupBy($"user_id")
        .agg(
          sum(when(datediff($"day", $"d0") < 15, $"cents").otherwise(0L))
            .as("x"),
          sum(when(datediff($"day", $"d0") >= 15, $"cents").otherwise(0L))
            .as("y"))
        .withColumn("variant",
          (conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
            .cast("long") % 2).cast("int"))
      val cells = u.groupBy($"variant").agg(
        count(lit(1)).as("nv"),
        sum($"x").as("sxv"), sum($"y").as("syv"),
        sum($"x" * $"x").as("sxxv"), sum($"x" * $"y").as("sxyv"),
        sum($"y" * $"y").as("syyv"))
      val pool = cells.agg(
        sum($"nv").as("n"), sum($"sxv").as("sx"), sum($"syv").as("sy"),
        sum($"sxxv").as("sxx"), sum($"sxyv").as("sxy"),
        sum($"syyv").as("syy"))
      val d = (c: String) => col(c).cast("double")
      val cxy = d("n") * d("sxy") - d("sx") * d("sy")
      val cxx = d("n") * d("sxx") - d("sx") * d("sx")
      val cyy = d("n") * d("syy") - d("sy") * d("sy")
      val g = cells.crossJoin(broadcast(pool))
      g.select($"variant", $"nv".as("n_users"),
          r6(d("syv") / d("nv") / lit(100.0)).as("mean_post"),
          r6((d("syv") / d("nv") -
            (cxy / cxx) * (d("sxv") / d("nv") - d("sx") / d("n"))) /
            lit(100.0)).as("mean_post_adj"),
          r6(cxy / cxx).as("theta"),
          r6(cxy * cxy / (cxx * cyy)).as("rho2"))
        .orderBy($"variant")
    },
    Some(s"""
      WITH ev AS (
        SELECT cast(date_trunc('day', ts) as date) AS day, user_id,
               cast(floor("value" * cast(100.0 as double) +
                 cast(0.5 as double)) as bigint) AS cents
        FROM events),
      b AS (SELECT min(day) AS d0 FROM ev),
      u AS (
        SELECT user_id,
               cast(sum(CASE WHEN date_diff('day', d0, day) < 15
                 THEN cents ELSE 0 END) as bigint) AS x,
               cast(sum(CASE WHEN date_diff('day', d0, day) >= 15
                 THEN cents ELSE 0 END) as bigint) AS y,
               cast(('0x' || substr(md5(cast(user_id as varchar)), 1, 8))
                 ::BIGINT % 2 as int) AS variant
        FROM ev, b GROUP BY user_id, variant),
      cells AS (
        SELECT variant, count(*) AS nv,
               cast(sum(x) as bigint) AS sxv, cast(sum(y) as bigint) AS syv,
               cast(sum(x*x) as bigint) AS sxxv,
               cast(sum(x*y) as bigint) AS sxyv,
               cast(sum(y*y) as bigint) AS syyv
        FROM u GROUP BY variant),
      pool AS (
        SELECT cast(sum(nv) as bigint) AS n,
               cast(sum(sxv) as bigint) AS sx,
               cast(sum(syv) as bigint) AS sy,
               cast(sum(sxxv) as bigint) AS sxx,
               cast(sum(sxyv) as bigint) AS sxy,
               cast(sum(syyv) as bigint) AS syy
        FROM cells)
      SELECT variant, nv AS n_users,
             ${r6Sql("cast(syv as double) / cast(nv as double) / " +
               "cast(100.0 as double)")} AS mean_post,
             ${r6Sql(
               "(cast(syv as double) / cast(nv as double) - " +
               "((cast(n as double)*cast(sxy as double) - " +
               "cast(sx as double)*cast(sy as double)) / " +
               "(cast(n as double)*cast(sxx as double) - " +
               "cast(sx as double)*cast(sx as double))) * " +
               "(cast(sxv as double) / cast(nv as double) - " +
               "cast(sx as double) / cast(n as double))) / " +
               "cast(100.0 as double)")} AS mean_post_adj,
             ${r6Sql(
               "(cast(n as double)*cast(sxy as double) - " +
               "cast(sx as double)*cast(sy as double)) / " +
               "(cast(n as double)*cast(sxx as double) - " +
               "cast(sx as double)*cast(sx as double))")} AS theta,
             ${r6Sql(
               "(cast(n as double)*cast(sxy as double) - " +
               "cast(sx as double)*cast(sy as double)) * " +
               "(cast(n as double)*cast(sxy as double) - " +
               "cast(sx as double)*cast(sy as double)) / " +
               "((cast(n as double)*cast(sxx as double) - " +
               "cast(sx as double)*cast(sx as double)) * " +
               "(cast(n as double)*cast(syy as double) - " +
               "cast(sy as double)*cast(sy as double)))")} AS rho2
      FROM cells, pool ORDER BY variant"""),
  )

  /** DIFFERENCE-IN-DIFFERENCES on average order value: treatment =
    * customers of ASIA nations, pre/post split at 1998-01-01 (TPC-H
    * orders span 1992 to mid-1998 at every SF, so "post" is the final
    * ~7 months — thin but non-empty, and both engines see identical
    * cells; the spec asserts all four cells are populated). The whole
    * design collapses
    * to ONE conditional-aggregation row — four (n, Σcents, Σcents²)
    * cells — so no cross-row float sum exists at all. Σcents² exceeds
    * int64 at sf0.1 (avg 2.2e14/order × 150k rows), so it is summed in
    * decimal(38,0) — exact in both engines — and cast to double once
    * for the variance closed form. Reports the four cell means, the DiD
    * estimate, and its large-sample Wald SE / t. */
  val qDid: GQuery = GQuery(
    "q_did",
    (spark, dir) => {
      import spark.implicits._
      val asia = Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)
          .filter($"r_name" === "ASIA")), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey")
      val cust = Tables.customer(spark, dir)
        .join(broadcast(asia), $"c_nationkey" === $"n_nationkey", "left_outer")
        .select($"c_custkey", $"n_nationkey".isNotNull.as("trt"))
      val o = Tables.orders(spark, dir)
        .join(cust, $"o_custkey" === $"c_custkey")
        .select($"trt",
          ($"o_orderdate" >= lit("1998-01-01").cast("timestamp_ntz"))
            .as("post"),
          floor($"o_totalprice" * lit(100.0) + lit(0.5)).cast("long")
            .as("cents"))
      def cell(tr: Boolean, po: Boolean, suf: String) = Seq(
        sum(when($"trt" === tr && $"post" === po, 1L).otherwise(0L))
          .as(s"n$suf"),
        sum(when($"trt" === tr && $"post" === po, $"cents").otherwise(0L))
          .as(s"s$suf"),
        sum(when($"trt" === tr && $"post" === po,
          ($"cents" * $"cents").cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as(s"q$suf"))
      val cols = cell(false, false, "00") ++ cell(false, true, "01") ++
        cell(true, false, "10") ++ cell(true, true, "11")
      val a = o.agg(cols.head, cols.tail: _*)
      val d = (c: String) => col(c).cast("double")
      def m(suf: String) = d(s"s$suf") / d(s"n$suf") / lit(100.0)
      def v(suf: String) =
        (d(s"q$suf") - d(s"s$suf") * d(s"s$suf") / d(s"n$suf")) /
          (d(s"n$suf") - lit(1.0)) / lit(10000.0)
      val did = (m("11") - m("10")) - (m("01") - m("00"))
      val se = sqrt(v("00") / d("n00") + v("01") / d("n01") +
        v("10") / d("n10") + v("11") / d("n11"))
      a.select($"n00", $"n01", $"n10", $"n11",
        r6(m("00")).as("mean_ctl_pre"), r6(m("01")).as("mean_ctl_post"),
        r6(m("10")).as("mean_trt_pre"), r6(m("11")).as("mean_trt_post"),
        r6(did).as("did"), r6(se).as("se"), r6(did / se).as("t_stat"))
    },
    Some {
      def mS(s: String) =
        s"cast(s$s as double) / cast(n$s as double) / cast(100.0 as double)"
      def vS(s: String) =
        s"(cast(q$s as double) - cast(s$s as double) * cast(s$s as double)" +
          s" / cast(n$s as double)) / (cast(n$s as double) - " +
          s"cast(1.0 as double)) / cast(10000.0 as double)"
      val didS = s"((${mS("11")}) - (${mS("10")})) - " +
        s"((${mS("01")}) - (${mS("00")}))"
      val seS = s"sqrt((${vS("00")}) / cast(n00 as double) + " +
        s"(${vS("01")}) / cast(n01 as double) + " +
        s"(${vS("10")}) / cast(n10 as double) + " +
        s"(${vS("11")}) / cast(n11 as double))"
      def cellS(tr: Int, po: Int, suf: String) =
        s"""cast(sum(CASE WHEN trt = $tr AND post = $po
               THEN 1 ELSE 0 END) as bigint) AS n$suf,
             cast(sum(CASE WHEN trt = $tr AND post = $po
               THEN cents ELSE 0 END) as bigint) AS s$suf,
             sum(CASE WHEN trt = $tr AND post = $po
               THEN cast(cents * cents as decimal(38,0))
               ELSE cast(0 as decimal(38,0)) END) AS q$suf"""
      s"""
      WITH asia AS (
        SELECT n_nationkey FROM nation JOIN region
          ON n_regionkey = r_regionkey AND r_name = 'ASIA'),
      cust AS (
        SELECT c_custkey,
               CASE WHEN n_nationkey IS NOT NULL THEN 1 ELSE 0 END AS trt
        FROM customer LEFT JOIN asia ON c_nationkey = n_nationkey),
      o AS (
        SELECT trt,
               CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                 THEN 1 ELSE 0 END AS post,
               cast(floor(o_totalprice * cast(100.0 as double) +
                 cast(0.5 as double)) as bigint) AS cents
        FROM orders JOIN cust ON o_custkey = c_custkey),
      a AS (
        SELECT ${cellS(0, 0, "00")}, ${cellS(0, 1, "01")},
               ${cellS(1, 0, "10")}, ${cellS(1, 1, "11")}
        FROM o)
      SELECT n00, n01, n10, n11,
             ${r6Sql(mS("00"))} AS mean_ctl_pre,
             ${r6Sql(mS("01"))} AS mean_ctl_post,
             ${r6Sql(mS("10"))} AS mean_trt_pre,
             ${r6Sql(mS("11"))} AS mean_trt_post,
             ${r6Sql(didS)} AS did,
             ${r6Sql(seS)} AS se,
             ${r6Sql(s"($didS) / ($seS)")} AS t_stat
      FROM a"""
    },
  )

  /** GRANGER-style lead-lag test: do yesterday's clicks predict today's
    * purchases beyond yesterday's purchases? Restricted (y ~ y₋₁) vs
    * full (y ~ y₋₁ + x₋₁) OLS on the calendar-complete daily count
    * series (30 rows at any SF — missing days are true zeros, a lag
    * pair across a silent gap would be wrong), both models solved in
    * closed form from one pass of INTEGER sufficient statistics; F =
    * ((SSE_r − SSE_f)/1)/(SSE_f/(n−3)). The unpartitioned lag window
    * rides the |days|-row aggregate, never raw events. */
  val qGranger: GQuery = GQuery(
    "q_granger",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .filter($"event_type".isin("click", "purchase"))
        .select(to_date($"ts").as("day"), $"event_type")
      val daily = ev.groupBy($"day").agg(
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
      // bounds from the 30-row aggregate, not a second events scan
      val spine = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val s = spine.join(daily, Seq("day"), "left_outer")
        .select($"day", coalesce($"x", lit(0L)).as("x"),
          coalesce($"y", lit(0L)).as("y"))
      val w = Window.orderBy($"day")
      val l = s
        .withColumn("x1", lag($"x", 1).over(w))
        .withColumn("y1", lag($"y", 1).over(w))
        .filter($"y1".isNotNull)
      val a = l.agg(count(lit(1)).as("n"),
        sum($"y").as("sy"), sum($"y1").as("sy1"), sum($"x1").as("sx1"),
        sum($"y" * $"y").as("syy"), sum($"y" * $"y1").as("syy1"),
        sum($"y" * $"x1").as("syx1"), sum($"y1" * $"y1").as("sy1y1"),
        sum($"x1" * $"x1").as("sx1x1"), sum($"y1" * $"x1").as("sy1x1"))
      val d = (c: String) => col(c).cast("double")
      val n = d("n")
      val cyy = d("syy") - d("sy") * d("sy") / n
      val cyy1 = d("syy1") - d("sy") * d("sy1") / n
      val cyx1 = d("syx1") - d("sy") * d("sx1") / n
      val c11 = d("sy1y1") - d("sy1") * d("sy1") / n
      val c22 = d("sx1x1") - d("sx1") * d("sx1") / n
      val c12 = d("sy1x1") - d("sy1") * d("sx1") / n
      val sseR = cyy - cyy1 * cyy1 / c11
      val den = c11 * c22 - c12 * c12
      val b1 = (cyy1 * c22 - cyx1 * c12) / den
      val b2 = (cyx1 * c11 - cyy1 * c12) / den
      val sseF = cyy - b1 * cyy1 - b2 * cyx1
      a.select($"n".as("n_obs"),
        r6(b1).as("b_ylag"), r6(b2).as("b_xlag"),
        r6(sseR).as("sse_r"), r6(sseF).as("sse_f"),
        r6((sseR - sseF) / (sseF / (n - lit(3.0)))).as("f_stat"))
    },
    Some {
      val n = "cast(n as double)"
      def dd(c: String) = s"cast($c as double)"
      val cyy = s"(${dd("syy")} - ${dd("sy")} * ${dd("sy")} / $n)"
      val cyy1 = s"(${dd("syy1")} - ${dd("sy")} * ${dd("sy1")} / $n)"
      val cyx1 = s"(${dd("syx1")} - ${dd("sy")} * ${dd("sx1")} / $n)"
      val c11 = s"(${dd("sy1y1")} - ${dd("sy1")} * ${dd("sy1")} / $n)"
      val c22 = s"(${dd("sx1x1")} - ${dd("sx1")} * ${dd("sx1")} / $n)"
      val c12 = s"(${dd("sy1x1")} - ${dd("sy1")} * ${dd("sx1")} / $n)"
      val sseR = s"($cyy - $cyy1 * $cyy1 / $c11)"
      val den = s"($c11 * $c22 - $c12 * $c12)"
      val b1 = s"(($cyy1 * $c22 - $cyx1 * $c12) / $den)"
      val b2 = s"(($cyx1 * $c11 - $cyy1 * $c12) / $den)"
      val sseF = s"($cyy - $b1 * $cyy1 - $b2 * $cyx1)"
      s"""
      WITH ev AS (
        SELECT cast(date_trunc('day', ts) as date) AS day, event_type
        FROM events WHERE event_type IN ('click', 'purchase')),
      daily0 AS (
        SELECT day,
               cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 as bigint) AS x,
               cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 as bigint) AS y
        FROM ev GROUP BY day),
      bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily0),
      spine AS (
        SELECT cast(unnest(generate_series(cast(d0 as timestamp),
                 cast(d1 as timestamp), INTERVAL 1 DAY)) as date) AS day
        FROM bounds),
      s AS (
        SELECT spine.day, coalesce(x, 0) AS x, coalesce(y, 0) AS y
        FROM spine LEFT JOIN daily0 USING (day)),
      l AS (
        SELECT y, lag(x) OVER (ORDER BY day) AS x1,
               lag(y) OVER (ORDER BY day) AS y1
        FROM s),
      a AS (
        SELECT count(*) AS n,
               cast(sum(y) as bigint) AS sy,
               cast(sum(y1) as bigint) AS sy1,
               cast(sum(x1) as bigint) AS sx1,
               cast(sum(y*y) as bigint) AS syy,
               cast(sum(y*y1) as bigint) AS syy1,
               cast(sum(y*x1) as bigint) AS syx1,
               cast(sum(y1*y1) as bigint) AS sy1y1,
               cast(sum(x1*x1) as bigint) AS sx1x1,
               cast(sum(y1*x1) as bigint) AS sy1x1
        FROM l WHERE y1 IS NOT NULL)
      SELECT n AS n_obs,
             ${r6Sql(b1)} AS b_ylag,
             ${r6Sql(b2)} AS b_xlag,
             ${r6Sql(sseR)} AS sse_r,
             ${r6Sql(sseF)} AS sse_f,
             ${r6Sql(s"($sseR - $sseF) / ($sseF / ($n - " +
               "cast(3.0 as double)))")} AS f_stat
      FROM a"""
    },
  )

  /** SAMPLE-RATIO MISMATCH (SRM) check — the first gate run on any
    * experiment: χ² of the observed variant split against the intended
    * 50/50. Uses the same md5 hash split as q_cuped (so the two queries
    * audit the same assignment); one combinable distinct-user pass →
    * two integer cells → fixed IEEE χ². A healthy split at every SF
    * (the hash is uniform), but the operator exists to catch the
    * non-uniform day. */
  val qSrm: GQuery = GQuery(
    "q_srm",
    (spark, dir) => {
      import spark.implicits._
      val u = Tables.events(spark, dir).select($"user_id").distinct()
        .withColumn("variant",
          (conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
            .cast("long") % 2).cast("int"))
      val c = u.agg(
        sum(when($"variant" === 0, 1L).otherwise(0L)).as("n0"),
        sum(when($"variant" === 1, 1L).otherwise(0L)).as("n1"))
      val d = (s: String) => col(s).cast("double")
      val e = (d("n0") + d("n1")) / lit(2.0)
      val chi2 = (d("n0") - e) * (d("n0") - e) / e +
        (d("n1") - e) * (d("n1") - e) / e
      c.select($"n0", $"n1",
        r6(d("n0") / (d("n0") + d("n1"))).as("ratio0"),
        r6(chi2).as("chi2"),
        (chi2 > lit(3.841)).as("srm_flag"))
    },
    Some {
      val e = "((cast(n0 as double) + cast(n1 as double)) / " +
        "cast(2.0 as double))"
      val chi2 = s"(cast(n0 as double) - $e) * (cast(n0 as double) - $e)" +
        s" / $e + (cast(n1 as double) - $e) * (cast(n1 as double) - $e)" +
        s" / $e"
      s"""
      WITH u AS (
        SELECT DISTINCT user_id,
               cast(('0x' || substr(md5(cast(user_id as varchar)), 1, 8))
                 ::BIGINT % 2 as int) AS variant
        FROM events),
      c AS (
        SELECT cast(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) as bigint)
                 AS n0,
               cast(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) as bigint)
                 AS n1
        FROM u)
      SELECT n0, n1,
             ${r6Sql("cast(n0 as double) / (cast(n0 as double) + " +
               "cast(n1 as double))")} AS ratio0,
             ${r6Sql(chi2)} AS chi2,
             ($chi2) > cast(3.841 as double) AS srm_flag
      FROM c"""
    },
  )

  /** MINIMUM DETECTABLE EFFECT for the q_cuped experiment design:
    * MDE = (z_{α/2}+z_β)·σ·√(2/n̄) at 95%/80% (the two z constants are
    * fixed literals — no quantile function needed), reported for both
    * the raw metric σ and the CUPED-adjusted σ·√(1−ρ²), quantifying
    * what the variance reduction buys in absolute dollars. Rides the
    * identical per-user integer-moment pass as q_cuped; one output
    * row. */
  val qMde: GQuery = GQuery(
    "q_mde",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select(to_date($"ts").as("day"), $"user_id",
          floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      val b = ev.agg(min($"day").as("d0"))
      val u = ev.crossJoin(broadcast(b))
        .groupBy($"user_id")
        .agg(
          sum(when(datediff($"day", $"d0") < 15, $"cents").otherwise(0L))
            .as("x"),
          sum(when(datediff($"day", $"d0") >= 15, $"cents").otherwise(0L))
            .as("y"))
      val a = u.agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"),
        sum($"y" * $"y").as("syy"))
      val d = (c: String) => col(c).cast("double")
      val n = d("n")
      val varY = (n * d("syy") - d("sy") * d("sy")) / (n * (n - lit(1.0)))
      val rho2 = (n * d("sxy") - d("sx") * d("sy")) *
        (n * d("sxy") - d("sx") * d("sy")) /
        ((n * d("sxx") - d("sx") * d("sx")) *
          (n * d("syy") - d("sy") * d("sy")))
      val zsum = lit(1.959964) + lit(0.841621)
      val mde = zsum * sqrt(varY) * sqrt(lit(2.0) / (n / lit(2.0)))
      a.select($"n".as("n_users"),
        r6(sqrt(varY) / lit(100.0)).as("sd_dollars"),
        r6(rho2).as("rho2"),
        r6(mde / lit(100.0)).as("mde_raw"),
        r6(mde * sqrt(lit(1.0) - rho2) / lit(100.0)).as("mde_cuped"))
    },
    Some {
      val n = "cast(n as double)"
      val varY = s"(($n * cast(syy as double) - cast(sy as double) * " +
        s"cast(sy as double)) / ($n * ($n - cast(1.0 as double))))"
      val rho2 = s"(($n * cast(sxy as double) - cast(sx as double) * " +
        s"cast(sy as double)) * ($n * cast(sxy as double) - " +
        s"cast(sx as double) * cast(sy as double)) / " +
        s"(($n * cast(sxx as double) - cast(sx as double) * " +
        s"cast(sx as double)) * ($n * cast(syy as double) - " +
        s"cast(sy as double) * cast(sy as double))))"
      val mde = s"((cast(1.959964 as double) + cast(0.841621 as double))" +
        s" * sqrt($varY) * sqrt(cast(2.0 as double) / " +
        s"($n / cast(2.0 as double))))"
      s"""
      WITH ev AS (
        SELECT cast(date_trunc('day', ts) as date) AS day, user_id,
               cast(floor("value" * cast(100.0 as double) +
                 cast(0.5 as double)) as bigint) AS cents
        FROM events),
      b AS (SELECT min(day) AS d0 FROM ev),
      u AS (
        SELECT user_id,
               cast(sum(CASE WHEN date_diff('day', d0, day) < 15
                 THEN cents ELSE 0 END) as bigint) AS x,
               cast(sum(CASE WHEN date_diff('day', d0, day) >= 15
                 THEN cents ELSE 0 END) as bigint) AS y
        FROM ev, b GROUP BY user_id),
      a AS (
        SELECT count(*) AS n,
               cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
               cast(sum(x*x) as bigint) AS sxx,
               cast(sum(x*y) as bigint) AS sxy,
               cast(sum(y*y) as bigint) AS syy
        FROM u)
      SELECT n AS n_users,
             ${r6Sql(s"sqrt($varY) / cast(100.0 as double)")} AS sd_dollars,
             ${r6Sql(rho2)} AS rho2,
             ${r6Sql(s"$mde / cast(100.0 as double)")} AS mde_raw,
             ${r6Sql(s"$mde * sqrt(cast(1.0 as double) - $rho2) / " +
               "cast(100.0 as double)")} AS mde_cuped
      FROM a"""
    },
  )

  /** PERMUTATION TEST for the variant difference in per-user spend —
    * the assumption-free significance check beside q_mde's normal
    * theory. The B=200 resamples are DETERMINISTIC hash relabelings
    * (md5(user_id || ':' || b) — same split idiom as q_cuped, so both
    * engines generate bit-identical permutations; no RNG state to
    * disagree on). The fact collapses to the |users|-bounded integer
    * table FIRST; the B-fold expansion explodes THAT (users × 200, not
    * events × 200 — the blow-up is bounded by B·|users| at any SF),
    * and each permutation is one conditional integer sum. p-value uses
    * the standard (1 + #{|T_b| ≥ |T_obs|})/(B+1) correction; the ≥
    * compare is between identically-computed IEEE doubles, so the
    * survivor set is identical across engines. */
  val qPermTest: GQuery = GQuery(
    "q_perm_test",
    (spark, dir) => {
      import spark.implicits._
      val u = Tables.events(spark, dir)
        .select($"user_id",
          floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("cents"))
        .groupBy($"user_id").agg(sum($"cents").as("y"))
        .withColumn("variant",
          (conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
            .cast("long") % 2).cast("int"))
        .localCheckpoint()
      val d = (c: String) => col(c).cast("double")
      val obs = u.agg(
        sum(when($"variant" === 1, $"y").otherwise(0L)).as("s1"),
        sum(when($"variant" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"variant" === 0, $"y").otherwise(0L)).as("s0"),
        sum(when($"variant" === 0, 1L).otherwise(0L)).as("n0"))
        .select((d("s1") / d("n1") - d("s0") / d("n0")).as("t_obs"),
          ($"n1" + $"n0").as("n_users"))
      val perms = u
        .select($"user_id", $"y",
          explode(expr("sequence(1, 200)")).as("b"))
        .withColumn("pv",
          (conv(substring(md5(concat($"user_id".cast("string"), lit(":"),
            $"b".cast("string"))), 1, 8), 16, 10).cast("long") % 2)
            .cast("int"))
        .groupBy($"b").agg(
          sum(when($"pv" === 1, $"y").otherwise(0L)).as("s1"),
          sum(when($"pv" === 1, 1L).otherwise(0L)).as("n1"),
          sum(when($"pv" === 0, $"y").otherwise(0L)).as("s0"),
          sum(when($"pv" === 0, 1L).otherwise(0L)).as("n0"))
        .select($"b", (d("s1") / d("n1") - d("s0") / d("n0")).as("tb"))
      perms.crossJoin(broadcast(obs))
        .agg(count(lit(1)).as("n_perms"),
          max($"n_users").as("n_users"),
          max($"t_obs").as("t_obs_c"),
          sum(when(abs($"tb") >= abs($"t_obs"), 1L).otherwise(0L))
            .as("n_ge"))
        .select($"n_users", $"n_perms",
          r6($"t_obs_c" / lit(100.0)).as("obs_diff"),
          r6(($"n_ge" + lit(1L)).cast("double") /
            ($"n_perms" + lit(1L)).cast("double")).as("p_value"))
    },
    Some(s"""
      WITH u AS (
        SELECT user_id, cast(sum(cast(floor("value" *
                 cast(100.0 as double) + cast(0.5 as double)) as bigint))
                 as bigint) AS y,
               cast(('0x' || substr(md5(cast(user_id as varchar)), 1, 8))
                 ::BIGINT % 2 as int) AS variant
        FROM events GROUP BY user_id),
      obs AS (
        SELECT cast(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) as double)
                 / cast(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
                 as double)
               - cast(sum(CASE WHEN variant = 0 THEN y ELSE 0 END)
                 as double)
                 / cast(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
                 as double) AS t_obs,
               cast(count(*) as bigint) AS n_users
        FROM u),
      perms AS (
        SELECT b,
               cast(sum(CASE WHEN pv = 1 THEN y ELSE 0 END) as double)
                 / cast(sum(CASE WHEN pv = 1 THEN 1 ELSE 0 END) as double)
               - cast(sum(CASE WHEN pv = 0 THEN y ELSE 0 END) as double)
                 / cast(sum(CASE WHEN pv = 0 THEN 1 ELSE 0 END) as double)
                 AS tb
        FROM (
          SELECT user_id, y, b,
                 cast(('0x' || substr(md5(cast(user_id as varchar) || ':' ||
                   cast(b as varchar)), 1, 8))::BIGINT % 2 as int) AS pv
          FROM u, (SELECT unnest(generate_series(1, 200)) AS b) bs) p
        GROUP BY b)
      SELECT n_users, cast(count(*) as bigint) AS n_perms,
             ${r6Sql("max(t_obs) / cast(100.0 as double)")} AS obs_diff,
             ${r6Sql("cast(sum(CASE WHEN abs(tb) >= abs(t_obs) " +
               "THEN 1 ELSE 0 END) + 1 as double) / " +
               "cast(count(*) + 1 as double)")} AS p_value
      FROM perms CROSS JOIN obs
      GROUP BY n_users"""),
  )

  /** INSTRUMENTAL-VARIABLE (2SLS) slope with INSTRUMENT-STRENGTH
    * SCREENING — the causal workhorse the CUPED/DiD family lacks, run
    * over TWO candidate instruments side by side so the weak-instrument
    * diagnostic is demonstrated, not just printed: the net-on-gross
    * revenue slope beta_IV = Cov(z,y)/Cov(z,x) under (a) z = the gross
    * price band (x div 100 -- structurally tied to x, first stage
    * r ~ 1) and (b) z = quantity (independent of price in the fixtures,
    * first stage r ~ 0 -- the textbook weak instrument whose beta_IV is
    * meaningless, which is exactly what the r column shows). Every
    * derived column is exact integer arithmetic from the established
    * cents extraction (gross dollars = cents div 100; net = x*(100-dh)
    * div 100 -- the `div`/`//` quotient contract), so ONE combinable
    * moment pass yields exact int64 sums at sf1, and the estimates are
    * fixed IEEE ratios of the n-cleared covariances (the q_cuped moment
    * contract: int64 sums cast to double BEFORE the n-products, so both
    * engines round identically even where magnitudes cancel). */
  val qIv2sls: GQuery = GQuery(
    "q_iv_2sls",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir).select(
        expr("floor(l_extendedprice * 100.0 + 0.5) div 100")
          .cast("long").as("x"),
        $"l_quantity".cast("long").as("z2"),
        floor($"l_discount" * lit(100.0) + lit(0.5)).cast("long").as("dh"))
        .withColumn("y", expr("x * (100 - dh) div 100"))
        .withColumn("z1", expr("x div 100"))
      val s = li.agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
        sum($"z1").as("sza"), sum($"z1" * $"y").as("szya"),
        sum($"z1" * $"x").as("szxa"), sum($"z1" * $"z1").as("szza"),
        sum($"z2").as("szb"), sum($"z2" * $"y").as("szyb"),
        sum($"z2" * $"x").as("szxb"), sum($"z2" * $"z2").as("szzb"))
      val stacked = s.selectExpr("n", "sx", "sy", "sxy", "sxx",
        "stack(2, 'price_band', sza, szya, szxa, szza, " +
          "'quantity', szb, szyb, szxb, szzb) AS (instrument, sz, szy, szx, szz)")
      val d = (c: String) => col(c).cast("double")
      val czy = d("n") * d("szy") - d("sz") * d("sy")
      val czx = d("n") * d("szx") - d("sz") * d("sx")
      val cxy = d("n") * d("sxy") - d("sx") * d("sy")
      val cxx = d("n") * d("sxx") - d("sx") * d("sx")
      val czz = d("n") * d("szz") - d("sz") * d("sz")
      stacked.select($"instrument", $"n",
        r6(cxy / cxx).as("beta_ols"),
        r6(czy / czx).as("beta_iv"),
        r6(czx / sqrt(czz * cxx)).as("first_stage_r"))
        .orderBy($"instrument")
    },
    Some {
      val czy = "(cast(n as double) * cast(szy as double) - " +
        "cast(sz as double) * cast(sy as double))"
      val czx = "(cast(n as double) * cast(szx as double) - " +
        "cast(sz as double) * cast(sx as double))"
      val cxy = "(cast(n as double) * cast(sxy as double) - " +
        "cast(sx as double) * cast(sy as double))"
      val cxx = "(cast(n as double) * cast(sxx as double) - " +
        "cast(sx as double) * cast(sx as double))"
      val czz = "(cast(n as double) * cast(szz as double) - " +
        "cast(sz as double) * cast(sz as double))"
      s"""
      WITH li0 AS (
        SELECT cast(floor(l_extendedprice * 100.0 + 0.5) as bigint) // 100
                 AS x,
               cast(l_quantity as bigint) AS z2,
               cast(floor(l_discount * 100.0 + 0.5) as bigint) AS dh
        FROM lineitem),
      li AS (SELECT x, z2, x * (100 - dh) // 100 AS y, x // 100 AS z1
             FROM li0),
      s AS (
        SELECT cast(count(*) as bigint) AS n,
               cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
               cast(sum(x*y) as bigint) AS sxy,
               cast(sum(x*x) as bigint) AS sxx,
               cast(sum(z1) as bigint) AS sza,
               cast(sum(z1*y) as bigint) AS szya,
               cast(sum(z1*x) as bigint) AS szxa,
               cast(sum(z1*z1) as bigint) AS szza,
               cast(sum(z2) as bigint) AS szb,
               cast(sum(z2*y) as bigint) AS szyb,
               cast(sum(z2*x) as bigint) AS szxb,
               cast(sum(z2*z2) as bigint) AS szzb
        FROM li),
      st AS (
        SELECT n, sx, sy, sxy, sxx, 'price_band' AS instrument,
               sza AS sz, szya AS szy, szxa AS szx, szza AS szz FROM s
        UNION ALL
        SELECT n, sx, sy, sxy, sxx, 'quantity' AS instrument,
               szb AS sz, szyb AS szy, szxb AS szx, szzb AS szz FROM s)
      SELECT instrument, n,
             ${r6Sql(s"$cxy / $cxx")} AS beta_ols,
             ${r6Sql(s"$czy / $czx")} AS beta_iv,
             ${r6Sql(s"$czx / sqrt($czz * $cxx)")} AS first_stage_r
      FROM st
      ORDER BY instrument"""
    },
  )

  /** GROUP-SEQUENTIAL A/B MONITORING — the "peek every week" view the
    * one-shot q_cuped/q_mde tests deliberately avoid: cumulative Welch z
    * between the md5-hash-split variants after every completed week,
    * compared against a flat Pocock-style boundary (2.413, the K=5
    * two-sided 0.05 constant — a shared literal, neither engine has the
    * boundary function). Weekly (variant, week) cells are ONE combinable
    * pass of exact integer moments (n, Σcents, Σcents²); the cumulative
    * prefix sums ride a window over the |weeks|-row cell table, so every
    * look's z is a fixed IEEE form over exact integers (the q_cuped
    * contract — int64 sums cast to double BEFORE the n-products).
    * Looks with a single observation in either arm emit NULL z (the
    * variance guard both engines apply identically). */
  val qGroupSeq: GQuery = GQuery(
    "q_group_seq",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select(
          expr("datediff(to_date(ts), date '1970-01-01') div 7").as("wk"),
          (conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
            .cast("long") % 2).cast("int").as("v"),
          floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      val cells = ev.groupBy($"wk", $"v")
        .agg(count(lit(1)).as("nw"), sum($"cents").as("sw"),
          sum($"cents" * $"cents").as("ssw"))
      val wCum = Window.partitionBy($"v").orderBy($"wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cells
        .withColumn("cn", sum($"nw").over(wCum))
        .withColumn("cs", sum($"sw").over(wCum))
        .withColumn("css", sum($"ssw").over(wCum))
        .select($"wk", $"v", $"cn", $"cs", $"css")
      val a = cum.filter($"v" === 0)
        .select($"wk", $"cn".as("n0"), $"cs".as("s0"), $"css".as("ss0"))
      val b = cum.filter($"v" === 1)
        .select($"wk", $"cn".as("n1"), $"cs".as("s1"), $"css".as("ss1"))
      val d = (c: String) => col(c).cast("double")
      val v0 = (d("n0") * d("ss0") - d("s0") * d("s0")) /
        (d("n0") * (d("n0") - lit(1.0)))
      val v1 = (d("n1") * d("ss1") - d("s1") * d("s1")) /
        (d("n1") * (d("n1") - lit(1.0)))
      val z = (d("s1") / d("n1") - d("s0") / d("n0")) /
        sqrt(v1 / d("n1") + v0 / d("n0"))
      a.join(b, "wk")
        .select($"wk", $"n0", $"n1",
          when($"n0" > 1 && $"n1" > 1, r6(z)).as("z"),
          when($"n0" > 1 && $"n1" > 1, abs(r6(z)) > lit(2.413))
            .as("crossed"))
        .orderBy($"wk")
    },
    Some {
      val v0 = "((cast(n0 as double) * cast(ss0 as double) - " +
        "cast(s0 as double) * cast(s0 as double)) / " +
        "(cast(n0 as double) * (cast(n0 as double) - cast(1.0 as double))))"
      val v1 = "((cast(n1 as double) * cast(ss1 as double) - " +
        "cast(s1 as double) * cast(s1 as double)) / " +
        "(cast(n1 as double) * (cast(n1 as double) - cast(1.0 as double))))"
      val z = s"((cast(s1 as double) / cast(n1 as double) - " +
        s"cast(s0 as double) / cast(n0 as double)) / " +
        s"sqrt($v1 / cast(n1 as double) + $v0 / cast(n0 as double)))"
      s"""
      WITH ev AS (
        SELECT date_diff('day', DATE '1970-01-01',
                 cast(date_trunc('second', ts) as date)) // 7 AS wk,
               cast(('0x' || substr(md5(cast(user_id as varchar)), 1, 8))
                 ::BIGINT % 2 as int) AS v,
               cast(floor("value" * cast(100.0 as double) +
                 cast(0.5 as double)) as bigint) AS cents
        FROM events),
      cells AS (
        SELECT wk, v, cast(count(*) as bigint) AS nw,
               cast(sum(cents) as bigint) AS sw,
               cast(sum(cents * cents) as bigint) AS ssw
        FROM ev GROUP BY wk, v),
      cum AS (
        SELECT wk, v,
               cast(sum(nw) OVER w as bigint) AS cn,
               cast(sum(sw) OVER w as bigint) AS cs,
               cast(sum(ssw) OVER w as bigint) AS css
        FROM cells
        WINDOW w AS (PARTITION BY v ORDER BY wk
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      a AS (SELECT wk, cn AS n0, cs AS s0, css AS ss0 FROM cum WHERE v = 0),
      b AS (SELECT wk, cn AS n1, cs AS s1, css AS ss1 FROM cum WHERE v = 1)
      SELECT wk, n0, n1,
             CASE WHEN n0 > 1 AND n1 > 1 THEN ${r6Sql(z)} END AS z,
             CASE WHEN n0 > 1 AND n1 > 1 THEN
               abs(${r6Sql(z)}) > cast(2.413 as double) END AS crossed
      FROM a JOIN b USING (wk)
      ORDER BY wk"""
    },
  )

  /** OAXACA–BLINDER three-fold decomposition of the returned-vs-kept
    * net-revenue gap: Δȳ = E + C + I with endowments
    * E = β_B(x̄_A − x̄_B), coefficients C = (α_A − α_B) + x̄_B(β_A − β_B),
    * interaction I = (x̄_A − x̄_B)(β_A − β_B) — the standard audit of
    * WHY two segments' means differ (different x, or different response
    * to x). Groups: A = returned lines (l_returnflag = 'R'), B = the
    * rest; x = gross dollars, y = net dollars (exact integer columns).
    * Per-group slope/intercept come from the same n-cleared integer
    * moment cells as q_cuped (ONE combinable pass, 2 cells); every
    * reported component is a fixed IEEE form over the exact moments,
    * and E + C + I reproduces the mean gap by construction. In the
    * fixtures both segments share a distribution, so the gap is ~0 —
    * the CONTRACT is the exact decomposition arithmetic (the q_ndcg
    * convention: near-chance values, fully exercised computation). */
  val qOaxaca: GQuery = GQuery(
    "q_oaxaca",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir).select(
        ($"l_returnflag" === "R").as("grp_a"),
        expr("floor(l_extendedprice * 100.0 + 0.5) div 100")
          .cast("long").as("x"),
        floor($"l_discount" * lit(100.0) + lit(0.5)).cast("long").as("dh"))
        .withColumn("y", expr("x * (100 - dh) div 100"))
      val cells = li.groupBy($"grp_a")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      val a = cells.filter($"grp_a") .select($"n".as("na"), $"sx".as("sxa"),
        $"sy".as("sya"), $"sxy".as("sxya"), $"sxx".as("sxxa"))
      val b = cells.filter(!$"grp_a").select($"n".as("nb"), $"sx".as("sxb"),
        $"sy".as("syb"), $"sxy".as("sxyb"), $"sxx".as("sxxb"))
      val d = (c: String) => col(c).cast("double")
      val betaA = (d("na") * d("sxya") - d("sxa") * d("sya")) /
        (d("na") * d("sxxa") - d("sxa") * d("sxa"))
      val betaB = (d("nb") * d("sxyb") - d("sxb") * d("syb")) /
        (d("nb") * d("sxxb") - d("sxb") * d("sxb"))
      val mxA = d("sxa") / d("na"); val myA = d("sya") / d("na")
      val mxB = d("sxb") / d("nb"); val myB = d("syb") / d("nb")
      val alphaA = myA - betaA * mxA
      val alphaB = myB - betaB * mxB
      a.crossJoin(broadcast(b))
        .select($"na", $"nb",
          r6(myA - myB).as("mean_gap"),
          r6(betaB * (mxA - mxB)).as("endowment"),
          r6((alphaA - alphaB) + mxB * (betaA - betaB)).as("coefficient"),
          r6((mxA - mxB) * (betaA - betaB)).as("interaction"))
    },
    Some {
      def beta(sfx: String) =
        s"((cast(n$sfx as double) * cast(sxy$sfx as double) - " +
          s"cast(sx$sfx as double) * cast(sy$sfx as double)) / " +
          s"(cast(n$sfx as double) * cast(sxx$sfx as double) - " +
          s"cast(sx$sfx as double) * cast(sx$sfx as double)))"
      def m(v: String, sfx: String) =
        s"(cast(${v}$sfx as double) / cast(n$sfx as double))"
      val (ba, bb) = (beta("a"), beta("b"))
      val (mxa, mya) = (m("sx", "a"), m("sy", "a"))
      val (mxb, myb) = (m("sx", "b"), m("sy", "b"))
      val aa = s"($mya - $ba * $mxa)"
      val ab = s"($myb - $bb * $mxb)"
      s"""
      WITH li0 AS (
        SELECT l_returnflag = 'R' AS grp_a,
               cast(floor(l_extendedprice * 100.0 + 0.5) as bigint) // 100
                 AS x,
               cast(floor(l_discount * 100.0 + 0.5) as bigint) AS dh
        FROM lineitem),
      li AS (SELECT grp_a, x, x * (100 - dh) // 100 AS y FROM li0),
      cells AS (
        SELECT grp_a, cast(count(*) as bigint) AS n,
               cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
               cast(sum(x*y) as bigint) AS sxy,
               cast(sum(x*x) as bigint) AS sxx
        FROM li GROUP BY grp_a),
      a AS (SELECT n AS na, sx AS sxa, sy AS sya, sxy AS sxya, sxx AS sxxa
            FROM cells WHERE grp_a),
      b AS (SELECT n AS nb, sx AS sxb, sy AS syb, sxy AS sxyb, sxx AS sxxb
            FROM cells WHERE NOT grp_a)
      SELECT na, nb,
             ${r6Sql(s"$mya - $myb")} AS mean_gap,
             ${r6Sql(s"$bb * ($mxa - $mxb)")} AS endowment,
             ${r6Sql(s"($aa - $ab) + $mxb * ($ba - $bb)")} AS coefficient,
             ${r6Sql(s"($mxa - $mxb) * ($ba - $bb)")} AS interaction
      FROM a CROSS JOIN b"""
    },
  )

  /** NEAREST-NEIGHBOR MATCHING ATT (propensity-score-matching shape) —
    * the design-based estimator next to q_cuped's regression adjustment:
    * every treated user is matched WITH REPLACEMENT to the control user
    * with the nearest balancing score (here the pre-period spend, the
    * same covariate CUPED regresses on), and ATT is the mean matched
    * outcome difference. The match is the q_join_asof_near shape on the
    * SCORE axis: one union-sorted window pass (controls sort before
    * treated at equal score, so ties resolve deterministically),
    * prior/next control carried by IGNORE-NULLS window functions, the
    * nearer one chosen by integer distance (tie → prior). All scores
    * and outcomes are exact integer cents, so ATT is exact integer
    * sums until one final division. The single unpartitioned window
    * rides the |users| table — the RankAtScaleSpec range-partitioned
    * two-pass swap applies unchanged at 100 TB. Reported next to the
    * unmatched naive difference. */
  val qPsmAtt: GQuery = GQuery(
    "q_psm_att",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select(to_date($"ts").as("day"), $"user_id",
          floor($"value" * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      val b = ev.agg(min($"day").as("d0"))
      val u = ev.crossJoin(broadcast(b))
        .groupBy($"user_id")
        .agg(
          sum(when(datediff($"day", $"d0") < 15, $"cents").otherwise(0L))
            .as("x"),
          sum(when(datediff($"day", $"d0") >= 15, $"cents").otherwise(0L))
            .as("y"))
        .withColumn("trt",
          (conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
            .cast("long") % 2) === 1)
      val ord = Seq($"x", when($"trt", 1).otherwise(0), $"user_id")
      val wb = Window.orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.orderBy(ord: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val cx0 = when(!$"trt", $"x")
      val cy0 = when(!$"trt", $"y")
      val m = u
        .withColumn("pcx", last(cx0, ignoreNulls = true).over(wb))
        .withColumn("pcy", last(cy0, ignoreNulls = true).over(wb))
        .withColumn("ncx", first(cx0, ignoreNulls = true).over(wf))
        .withColumn("ncy", first(cy0, ignoreNulls = true).over(wf))
        .withColumn("cy",
          when(!$"trt", lit(null).cast("long"))
            .when($"pcx".isNull, $"ncy")
            .when($"ncx".isNull, $"pcy")
            .when($"x" - $"pcx" <= $"ncx" - $"x", $"pcy")
            .otherwise($"ncy"))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      val a = m.agg(
        sum(when($"trt", 1L).otherwise(0L)).as("n_treated"),
        sum(when(!$"trt", 1L).otherwise(0L)).as("n_control"),
        sum(when($"trt" && $"cy".isNotNull, 1L).otherwise(0L)).as("n_matched"),
        sum(when($"trt" && $"cy".isNotNull, $"y" - $"cy").otherwise(0L))
          .as("sdiff"),
        sum(when($"trt", $"y").otherwise(0L)).as("sty"),
        sum(when(!$"trt", $"y").otherwise(0L)).as("scy"))
      a.select($"n_treated", $"n_control", $"n_matched",
        r6(d($"sdiff") / d($"n_matched") / lit(100.0)).as("att_dollars"),
        r6((d($"sty") / d($"n_treated") - d($"scy") / d($"n_control")) /
          lit(100.0)).as("naive_diff_dollars"))
    },
    Some(s"""
      WITH ev AS (
        SELECT cast(date_trunc('day', ts) as date) AS day, user_id,
               cast(floor("value" * cast(100.0 as double) +
                 cast(0.5 as double)) as bigint) AS cents
        FROM events),
      b AS (SELECT min(day) AS d0 FROM ev),
      u AS (
        SELECT user_id,
               cast(sum(CASE WHEN date_diff('day', d0, day) < 15
                 THEN cents ELSE 0 END) as bigint) AS x,
               cast(sum(CASE WHEN date_diff('day', d0, day) >= 15
                 THEN cents ELSE 0 END) as bigint) AS y,
               (('0x' || substr(md5(cast(user_id as varchar)), 1, 8))
                 ::BIGINT % 2) = 1 AS trt
        FROM ev, b GROUP BY user_id, trt),
      m AS (
        SELECT user_id, x, y, trt,
               last_value(CASE WHEN NOT trt THEN x END IGNORE NULLS)
                 OVER wb AS pcx,
               last_value(CASE WHEN NOT trt THEN y END IGNORE NULLS)
                 OVER wb AS pcy,
               first_value(CASE WHEN NOT trt THEN x END IGNORE NULLS)
                 OVER wf AS ncx,
               first_value(CASE WHEN NOT trt THEN y END IGNORE NULLS)
                 OVER wf AS ncy
        FROM u
        WINDOW
          wb AS (ORDER BY x, CASE WHEN trt THEN 1 ELSE 0 END, user_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (ORDER BY x, CASE WHEN trt THEN 1 ELSE 0 END, user_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      mm AS (
        SELECT trt, y,
               CASE WHEN NOT trt THEN NULL
                    WHEN pcx IS NULL THEN ncy
                    WHEN ncx IS NULL THEN pcy
                    WHEN x - pcx <= ncx - x THEN pcy
                    ELSE ncy END AS cy
        FROM m),
      a AS (
        SELECT cast(sum(CASE WHEN trt THEN 1 ELSE 0 END) as bigint)
                 AS n_treated,
               cast(sum(CASE WHEN NOT trt THEN 1 ELSE 0 END) as bigint)
                 AS n_control,
               cast(sum(CASE WHEN trt AND cy IS NOT NULL THEN 1 ELSE 0 END)
                 as bigint) AS n_matched,
               cast(sum(CASE WHEN trt AND cy IS NOT NULL THEN y - cy
                 ELSE 0 END) as bigint) AS sdiff,
               cast(sum(CASE WHEN trt THEN y ELSE 0 END) as bigint) AS sty,
               cast(sum(CASE WHEN NOT trt THEN y ELSE 0 END) as bigint)
                 AS scy
        FROM mm)
      SELECT n_treated, n_control, n_matched,
             ${r6Sql("cast(sdiff as double) / cast(n_matched as double) / " +
               "cast(100.0 as double)")} AS att_dollars,
             ${r6Sql("(cast(sty as double) / cast(n_treated as double) - " +
               "cast(scy as double) / cast(n_control as double)) / " +
               "cast(100.0 as double)")} AS naive_diff_dollars
      FROM a"""),
  )

  /** SHARP REGRESSION DISCONTINUITY at the zero-balance cutoff: local
    * linear fits of customer order spend on account balance on each
    * side of 0 within a ±$1000 bandwidth; the RD effect is the
    * difference of the two boundary intercepts (the cutoff IS x=0, so
    * the intercept needs no recentering). ONE conditional-sum pass
    * produces both sides' sufficient statistics: x = balance CENTS
    * (exact int64; Σx² < 2⁶³ through ~sf100 on the bandwidth-filtered
    * slice — documented bound), y = spend in KILODOLLARS (6-dp staged;
    * x·y ≤ 1e8 < 2³³, the staging-contract bound). Slopes/intercepts
    * are one fixed IEEE tree; customers without orders count as real
    * zero spend via the left join. */
  val qRdd: GQuery = GQuery(
    "q_rdd",
    (spark, dir) => {
      import spark.implicits._
      val dec = org.apache.spark.sql.types.DecimalType(30, 6)
      val cust = Tables.customer(spark, dir)
        .select($"c_custkey",
          floor($"c_acctbal" * lit(100.0) + lit(0.5)).cast("long").as("x"))
        .filter(abs($"x") <= 100000L)
      val spend = Tables.orders(spark, dir)
        .groupBy($"o_custkey")
        .agg(sum(floor($"o_totalprice" * lit(100.0) + lit(0.5))
          .cast("long")).as("yc"))
      val j = cust.join(spend, $"c_custkey" === $"o_custkey", "left_outer")
        .select($"x",
          (coalesce($"yc", lit(0L)).cast("double") / lit(100000.0)).as("y"),
          ($"x" >= 0L).as("hi"))
      val a = j.agg(
        sum(when($"hi", 1L).otherwise(0L)).as("n_hi"),
        sum(when(!$"hi", 1L).otherwise(0L)).as("n_lo"),
        sum(when($"hi", $"x").otherwise(0L)).as("sx_hi"),
        sum(when(!$"hi", $"x").otherwise(0L)).as("sx_lo"),
        sum(when($"hi", $"x" * $"x").otherwise(0L)).as("sxx_hi"),
        sum(when(!$"hi", $"x" * $"x").otherwise(0L)).as("sxx_lo"),
        sum(when($"hi", $"y".cast(dec)).otherwise(lit(0).cast(dec)))
          .cast("double").as("sy_hi"),
        sum(when(!$"hi", $"y".cast(dec)).otherwise(lit(0).cast(dec)))
          .cast("double").as("sy_lo"),
        sum(when($"hi", rN($"x".cast("double") * $"y", 6).cast(dec))
          .otherwise(lit(0).cast(dec))).cast("double").as("sxy_hi"),
        sum(when(!$"hi", rN($"x".cast("double") * $"y", 6).cast(dec))
          .otherwise(lit(0).cast(dec))).cast("double").as("sxy_lo"))
      def fit(sfx: String) = {
        val nD = col(s"n_$sfx").cast("double")
        val sxD = col(s"sx_$sfx").cast("double")
        val sxxD = col(s"sxx_$sfx").cast("double")
        val slope = (nD * col(s"sxy_$sfx") - sxD * col(s"sy_$sfx")) /
          (nD * sxxD - sxD * sxD)
        val icept = (col(s"sy_$sfx") - slope * sxD) / nD
        (slope, icept)
      }
      val (slHi, icHi) = fit("hi")
      val (slLo, icLo) = fit("lo")
      a.select($"n_lo", $"n_hi",
        r6(icLo).as("y0_lo"), r6(icHi).as("y0_hi"),
        r6(slLo * lit(100000.0)).as("slope_lo"),
        r6(slHi * lit(100000.0)).as("slope_hi"),
        r6(icHi - icLo).as("rd_effect"))
    },
    Some {
      def fit(s: String) = {
        val slope = s"((cast(n_$s as double) * sxy_$s - " +
          s"cast(sx_$s as double) * sy_$s) / " +
          s"(cast(n_$s as double) * cast(sxx_$s as double) - " +
          s"cast(sx_$s as double) * cast(sx_$s as double)))"
        val icept = s"((sy_$s - $slope * cast(sx_$s as double)) / " +
          s"cast(n_$s as double))"
        (slope, icept)
      }
      val (slHi, icHi) = fit("hi")
      val (slLo, icLo) = fit("lo")
      s"""
      WITH cust AS (
        SELECT c_custkey,
               cast(floor(c_acctbal * cast(100.0 as double) +
                 cast(0.5 as double)) as bigint) AS x
        FROM customer
        WHERE abs(cast(floor(c_acctbal * cast(100.0 as double) +
          cast(0.5 as double)) as bigint)) <= 100000),
      spend AS (
        SELECT o_custkey,
               cast(sum(cast(floor(o_totalprice * cast(100.0 as double) +
                 cast(0.5 as double)) as bigint)) as bigint) AS yc
        FROM orders GROUP BY o_custkey),
      j AS (
        SELECT x,
               cast(coalesce(yc, 0) as double) /
                 cast(100000.0 as double) AS y,
               x >= 0 AS hi
        FROM cust LEFT JOIN spend ON c_custkey = o_custkey),
      a AS (
        SELECT
          cast(sum(CASE WHEN hi THEN 1 ELSE 0 END) as bigint) AS n_hi,
          cast(sum(CASE WHEN hi THEN 0 ELSE 1 END) as bigint) AS n_lo,
          cast(sum(CASE WHEN hi THEN x ELSE 0 END) as bigint) AS sx_hi,
          cast(sum(CASE WHEN hi THEN 0 ELSE x END) as bigint) AS sx_lo,
          cast(sum(CASE WHEN hi THEN x * x ELSE 0 END) as bigint)
            AS sxx_hi,
          cast(sum(CASE WHEN hi THEN 0 ELSE x * x END) as bigint)
            AS sxx_lo,
          cast(sum(CASE WHEN hi THEN cast(y as decimal(30,6))
            ELSE cast(0 as decimal(30,6)) END) as double) AS sy_hi,
          cast(sum(CASE WHEN hi THEN cast(0 as decimal(30,6))
            ELSE cast(y as decimal(30,6)) END) as double) AS sy_lo,
          cast(sum(CASE WHEN hi THEN
            cast(${rNSql("cast(x as double) * y", 6)} as decimal(30,6))
            ELSE cast(0 as decimal(30,6)) END) as double) AS sxy_hi,
          cast(sum(CASE WHEN hi THEN cast(0 as decimal(30,6))
            ELSE cast(${rNSql("cast(x as double) * y", 6)}
              as decimal(30,6)) END) as double) AS sxy_lo
        FROM j)
      SELECT n_lo, n_hi,
             ${r6Sql(icLo)} AS y0_lo, ${r6Sql(icHi)} AS y0_hi,
             ${r6Sql(s"$slLo * cast(100000.0 as double)")} AS slope_lo,
             ${r6Sql(s"$slHi * cast(100000.0 as double)")} AS slope_hi,
             ${r6Sql(s"$icHi - ($icLo)")} AS rd_effect
      FROM a"""
    },
  )

  /** SOBEL MEDIATION TEST: does discount (X) move revenue (Y) through
    * quantity (M)? Path a from the OLS of M on X; path b from the
    * two-predictor OLS of Y on (M, X) — both closed-form from ONE
    * combinable pass of sufficient statistics (x = discount percentage
    * points and m = quantity are exact int64; y and its cross-moments
    * are kilodollar 6-dp staged, every term < 2³³). The indirect
    * effect a·b and z = a·b/√(a²s_b² + b²s_a²) finish in fixed IEEE
    * over the centered-moment tree (the q_partial_corr shape with a
    * residual-variance layer). */
  val qSobel: GQuery = GQuery(
    "q_sobel",
    (spark, dir) => {
      import spark.implicits._
      val dec = org.apache.spark.sql.types.DecimalType(30, 6)
      val li = Tables.lineitem(spark, dir).select(
        floor($"l_discount" * lit(100.0) + lit(0.5)).cast("long").as("x"),
        $"l_quantity".cast("long").as("m"),
        ($"l_extendedprice" / lit(1000.0)).as("y"))
      val s = li.agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"m").as("sm"),
        sum($"x" * $"x").as("sxx"), sum($"m" * $"m").as("smm"),
        sum($"x" * $"m").as("sxm"),
        sum($"y".cast(dec)).cast("double").as("sy"),
        sum(rN($"x".cast("double") * $"y", 6).cast(dec))
          .cast("double").as("sxy"),
        sum(rN($"m".cast("double") * $"y", 6).cast(dec))
          .cast("double").as("smy"),
        sum(($"y" * $"y").cast(dec)).cast("double").as("syy"))
      val nD = $"n".cast("double")
      val d = (c: String) => col(c).cast("double")
      val cxx = d("sxx") - d("sx") * d("sx") / nD
      val cmm = d("smm") - d("sm") * d("sm") / nD
      val cxm = d("sxm") - d("sx") * d("sm") / nD
      val cxy = $"sxy" - d("sx") * $"sy" / nD
      val cmy = $"smy" - d("sm") * $"sy" / nD
      val cyy = $"syy" - $"sy" * $"sy" / nD
      val aPath = cxm / cxx
      val sa2 = ((cmm - aPath * aPath * cxx) / (nD - lit(2.0))) / cxx
      val det = cmm * cxx - cxm * cxm
      val bPath = (cmy * cxx - cxy * cxm) / det
      val cPrime = (cxy * cmm - cmy * cxm) / det
      val ssr = cyy - bPath * cmy - cPrime * cxy
      val sb2 = (ssr / (nD - lit(3.0))) * cxx / det
      val z = aPath * bPath /
        sqrt(aPath * aPath * sb2 + bPath * bPath * sa2)
      s.select($"n", r6(aPath).as("a_path"), r6(bPath).as("b_path"),
        r6(aPath * bPath).as("indirect"), r6(cPrime).as("direct"),
        r6(z).as("sobel_z"))
    },
    Some {
      val cxx = "(cast(sxx as double) - cast(sx as double) * " +
        "cast(sx as double) / cast(n as double))"
      val cmm = "(cast(smm as double) - cast(sm as double) * " +
        "cast(sm as double) / cast(n as double))"
      val cxm = "(cast(sxm as double) - cast(sx as double) * " +
        "cast(sm as double) / cast(n as double))"
      val cxy = "(sxy - cast(sx as double) * sy / cast(n as double))"
      val cmy = "(smy - cast(sm as double) * sy / cast(n as double))"
      val cyy = "(syy - sy * sy / cast(n as double))"
      val aP = s"($cxm / $cxx)"
      val sa2 = s"((($cmm - $aP * $aP * $cxx) / " +
        s"(cast(n as double) - cast(2.0 as double))) / $cxx)"
      val det = s"($cmm * $cxx - $cxm * $cxm)"
      val bP = s"(($cmy * $cxx - $cxy * $cxm) / $det)"
      val cP = s"(($cxy * $cmm - $cmy * $cxm) / $det)"
      val ssr = s"($cyy - $bP * $cmy - $cP * $cxy)"
      val sb2 = s"(($ssr / (cast(n as double) - cast(3.0 as double))) " +
        s"* $cxx / $det)"
      val z = s"($aP * $bP / sqrt($aP * $aP * $sb2 + $bP * $bP * $sa2))"
      s"""
      WITH li AS (
        SELECT cast(floor(l_discount * cast(100.0 as double) +
                 cast(0.5 as double)) as bigint) AS x,
               cast(l_quantity as bigint) AS m,
               l_extendedprice / cast(1000.0 as double) AS y
        FROM lineitem),
      s AS (
        SELECT cast(count(*) as bigint) AS n,
               cast(sum(x) as bigint) AS sx, cast(sum(m) as bigint) AS sm,
               cast(sum(x*x) as bigint) AS sxx,
               cast(sum(m*m) as bigint) AS smm,
               cast(sum(x*m) as bigint) AS sxm,
               cast(sum(cast(y as decimal(30,6))) as double) AS sy,
               cast(sum(cast(${rNSql("cast(x as double) * y", 6)}
                 as decimal(30,6))) as double) AS sxy,
               cast(sum(cast(${rNSql("cast(m as double) * y", 6)}
                 as decimal(30,6))) as double) AS smy,
               cast(sum(cast(y * y as decimal(30,6))) as double) AS syy
        FROM li)
      SELECT n, ${r6Sql(aP)} AS a_path, ${r6Sql(bP)} AS b_path,
             ${r6Sql(s"$aP * $bP")} AS indirect,
             ${r6Sql(cP)} AS direct,
             ${r6Sql(z)} AS sobel_z
      FROM s"""
    },
  )

  val all: Seq[GQuery] =
    Seq(qCuped, qDid, qGranger, qSrm, qMde, qPermTest, qIv2sls, qGroupSeq,
      qOaxaca, qPsmAtt, qRdd, qSobel)
}
