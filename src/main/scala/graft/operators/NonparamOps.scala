package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Nonparametric and categorical tests: Mann–Whitney U, Brown–Forsythe
  * Levene, Kendall's τ-b, and the 2×2 odds ratio. Like InferOps, every
  * test reduces the fact table to integer counts or decimal-staged
  * moments in ONE combinable pass, then evaluates a fixed IEEE closed
  * form over a value- or calendar-bounded table — rank statistics are
  * re-expressed as pairwise-count identities on the distinct-value axis
  * so no raw-row global sort ever appears. 100-TB posture of the one
  * remaining unpartitioned window (the cum-below prefix on the
  * collapsed distinct-value table): when |distinct| itself grows with
  * data, it swaps for the range-partitioned two-pass prefix sum —
  * per-partition local windows + a P-row broadcast offsets table —
  * proven bit-identical (integer adds, different association) in
  * RankAtScaleSpec; formulas, oracles, and outputs are unchanged.
  */
object NonparamOps {

  /** MANN–WHITNEY U (Wilcoxon rank-sum) on order totals, URGENT vs LOW:
    * U₁ counted pairwise on the distinct-value axis (wins + ½ties, kept
    * exact by doubling), with the tie-corrected normal approximation
    * z = (U₁ − n₁n₂/2)/σ, σ² = (n₁n₂/12)((n+1) − Σ(t³−t)/(n(n−1))).
    * The raw pass is the same combinable per-value (c₁,c₂) reduction as
    * q_ks_test; the cumulative window rides the distinct-value table.
    * Also reports the common-language effect size U₁/(n₁n₂). */
  val qMannWhitney: GQuery = GQuery(
    "q_mannwhitney",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
        .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
        .select($"o_totalprice".as("v"), $"o_orderpriority".as("pri"))
      val g = o.groupBy($"v")
        .agg(sum(when($"pri" === "1-URGENT", 1L).otherwise(0L)).as("c1"),
          sum(when($"pri" === "5-LOW", 1L).otherwise(0L)).as("c2"))
      val wBelow = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val a = g
        .withColumn("cum2", coalesce(sum($"c2").over(wBelow), lit(0L)))
        .agg(
          sum($"c1").as("n1"),
          sum($"c2").as("n2"),
          sum($"c1" * (lit(2L) * $"cum2" + $"c2")).as("u2"),
          sum(($"c1" + $"c2") * ($"c1" + $"c2") * ($"c1" + $"c2") -
            ($"c1" + $"c2")).as("ties3"))
      val d = (c: String) => col(c).cast("double")
      val n = d("n1") + d("n2")
      val u1 = d("u2") / lit(2.0)
      val mu = d("n1") * d("n2") / lit(2.0)
      val sig2 = d("n1") * d("n2") / lit(12.0) *
        ((n + lit(1.0)) - d("ties3") / (n * (n - lit(1.0))))
      a.select($"n1", $"n2", u1.as("u1"),
        r6((u1 - mu) / sqrt(sig2)).as("z"),
        r6(u1 / (d("n1") * d("n2"))).as("cles"))
    },
    Some(s"""
      WITH o AS (
        SELECT o_totalprice AS v, o_orderpriority AS pri
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      g AS (
        SELECT v,
               cast(sum(CASE WHEN pri = '1-URGENT' THEN 1 ELSE 0 END)
                 as bigint) AS c1,
               cast(sum(CASE WHEN pri = '5-LOW' THEN 1 ELSE 0 END)
                 as bigint) AS c2
        FROM o GROUP BY v),
      c AS (
        SELECT c1, c2,
               cast(coalesce(sum(c2) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 as bigint) AS cum2
        FROM g),
      a AS (
        SELECT cast(sum(c1) as bigint) AS n1,
               cast(sum(c2) as bigint) AS n2,
               cast(sum(c1 * (2 * cum2 + c2)) as bigint) AS u2,
               cast(sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2))
                 as bigint) AS ties3
        FROM c)
      SELECT n1, n2,
             cast(u2 as double) / cast(2.0 as double) AS u1,
             ${r6Sql(
               "(cast(u2 as double) / cast(2.0 as double) - " +
               "cast(n1 as double) * cast(n2 as double) / " +
               "cast(2.0 as double)) / " +
               "sqrt(cast(n1 as double) * cast(n2 as double) / " +
               "cast(12.0 as double) * " +
               "((cast(n1 as double) + cast(n2 as double) + " +
               "cast(1.0 as double)) - cast(ties3 as double) / " +
               "((cast(n1 as double) + cast(n2 as double)) * " +
               "(cast(n1 as double) + cast(n2 as double) - " +
               "cast(1.0 as double)))))")} AS z,
             ${r6Sql("cast(u2 as double) / cast(2.0 as double) / " +
               "(cast(n1 as double) * cast(n2 as double))")} AS cles
      FROM a"""),
  )

  /** BROWN–FORSYTHE LEVENE test: are account-balance spreads equal
    * across market segments? One-way ANOVA on the absolute deviations
    * from the per-segment MEDIAN (robust center — the BF variant). The
    * per-segment median rides the same scan as a windowed percentile
    * (q_winsorize shape) — but over INTEGER CENTS, because the
    * interpolated median of even-count 2-decimal DOUBLES is an
    * (a+b)/2-vs-a+0.5(b−a) one-ulp coin flip across engines (observed
    * at sf0.1), while on integers both forms are exactly k or k+0.5.
    * The exact cent deviation is scaled to KILOdollars by ONE shared
    * IEEE division — the unit is free (F is scale-invariant) and it is
    * load-bearing twice: cents² sums overflow the rN staging's bigint
    * floor, and even dollar² group moments (~10¹¹) sit where a double's
    * ulp exceeds 1e-6, so the 6 dp decimal staging itself diverges
    * across engines (observed at sf0.1: shortest-repr vs binary-value
    * rounding). In k$² every staged term stays ≪ 2³³ where the casts
    * agree. The F statistic follows q_anova's staging; SS columns are
    * in k$². */
  val qLevene: GQuery = GQuery(
    "q_levene",
    (spark, dir) => {
      import spark.implicits._
      val wg = Window.partitionBy($"c_mktsegment")
      val dev = Tables.customer(spark, dir)
        .select($"c_mktsegment",
          floor($"c_acctbal" * lit(100.0) + lit(0.5)).as("cents"))
        .withColumn("med", expr("percentile(cents, 0.5)").over(wg))
        .select($"c_mktsegment",
          (abs($"cents" - $"med") / lit(100000.0)).as("w"))
      val g = dev.groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("ni"),
          sum($"w".cast(DecimalType(30, 6))).as("si"),
          sum(($"w" * $"w").cast(DecimalType(30, 6))).as("qi"))
      val agg = g.agg(
        count(lit(1)).cast("int").as("k"),
        sum($"ni").as("n"),
        sum($"si").cast("double").as("s"),
        sum($"qi").cast("double").as("q"),
        sum(rN($"si".cast("double") * $"si".cast("double") /
            $"ni".cast("double"), 6)
          .cast(DecimalType(30, 6))).cast("double").as("ssq_grp"))
      val d = (c: String) => col(c).cast("double")
      val ssb = $"ssq_grp" - $"s" * $"s" / d("n")
      val ssw = $"q" - $"ssq_grp"
      agg.select($"k", $"n",
        r6(ssb).as("ss_between"),
        r6(ssw).as("ss_within"),
        r6((ssb / ($"k" - lit(1)).cast("double")) /
          (ssw / (d("n") - $"k".cast("double")))).as("f_bf"))
    },
    Some(s"""
      WITH cents AS (
        SELECT c_mktsegment,
               floor(c_acctbal * cast(100.0 as double) +
                 cast(0.5 as double)) AS cents
        FROM customer),
      w AS (
        SELECT c_mktsegment,
               abs(cents - quantile_cont(cents, 0.5)
                 OVER (PARTITION BY c_mktsegment)) /
                 cast(100000.0 as double) AS w
        FROM cents),
      g AS (
        SELECT c_mktsegment, count(*) AS ni,
               sum(cast(w as decimal(30,6))) AS si,
               sum(cast(w * w as decimal(30,6))) AS qi
        FROM w GROUP BY c_mktsegment),
      m AS (
        SELECT cast(count(*) as int) AS k,
               cast(sum(ni) as bigint) AS n,
               cast(sum(si) as double) AS s,
               cast(sum(qi) as double) AS q,
               cast(sum(cast(${rNSql(
                 "cast(si as double) * cast(si as double) / " +
                   "cast(ni as double)", 6)}
                 as decimal(30,6))) as double) AS ssq_grp
        FROM g)
      SELECT k, n,
             ${r6Sql("ssq_grp - s * s / cast(n as double)")} AS ss_between,
             ${r6Sql("q - ssq_grp")} AS ss_within,
             ${r6Sql("((ssq_grp - s * s / cast(n as double)) / " +
               "(cast(k as double) - 1.0)) / " +
               "((q - ssq_grp) / " +
               "(cast(n as double) - cast(k as double)))")} AS f_bf
      FROM m"""),
  )

  /** KENDALL'S τ-b between monthly order volume and monthly revenue —
    * rank correlation robust to the marginal distributions. The fact
    * collapses to a ~24-row CALENDAR-BOUNDED monthly table (integer
    * count, integer revenue cents); concordant/discordant/tied pair
    * counts come from the C(n,2) self-pairs of that tiny table (an
    * explicitly tiny broadcast non-equi join — the τ identity needs all
    * pairs and n is fixed by the calendar, never by data volume).
    * τ-b = (C−D)/(√(n₀−t₁)·√(n₀−t₂)) over exact bigints. */
  val qKendall: GQuery = GQuery(
    "q_kendall",
    (spark, dir) => {
      import spark.implicits._
      val m = Tables.orders(spark, dir)
        .groupBy(date_trunc("month", $"o_orderdate").as("mon"))
        .agg(count(lit(1)).as("x"),
          sum(floor($"o_totalprice" * lit(100.0) + lit(0.5)).cast("long"))
            .as("y"))
      val a = m.select($"mon".as("m1"), $"x".as("x1"), $"y".as("y1"))
      val b = m.select($"mon".as("m2"), $"x".as("x2"), $"y".as("y2"))
      val pairs = a.join(broadcast(b), $"m1" < $"m2")
      val agg = pairs.agg(
        count(lit(1)).as("n0"),
        sum(when(($"x2" - $"x1") * ($"y2" - $"y1") > 0, 1L).otherwise(0L))
          .as("c"),
        sum(when(($"x2" - $"x1") * ($"y2" - $"y1") < 0, 1L).otherwise(0L))
          .as("d"),
        sum(when($"x1" === $"x2", 1L).otherwise(0L)).as("t1"),
        sum(when($"y1" === $"y2", 1L).otherwise(0L)).as("t2"))
      agg.select($"n0", $"c".as("concordant"), $"d".as("discordant"),
        r6(($"c" - $"d").cast("double") /
          (sqrt(($"n0" - $"t1").cast("double")) *
            sqrt(($"n0" - $"t2").cast("double")))).as("tau_b"))
    },
    Some(s"""
      WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
               count(*) AS x,
               cast(sum(cast(floor(o_totalprice * cast(100.0 as double) +
                 cast(0.5 as double)) as bigint)) as bigint) AS y
        FROM orders GROUP BY 1),
      p AS (
        SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
        FROM m a JOIN m b ON a.mon < b.mon),
      agg AS (
        SELECT cast(count(*) as bigint) AS n0,
               cast(sum(CASE WHEN (x2 - x1) * (y2 - y1) > 0
                 THEN 1 ELSE 0 END) as bigint) AS c,
               cast(sum(CASE WHEN (x2 - x1) * (y2 - y1) < 0
                 THEN 1 ELSE 0 END) as bigint) AS d,
               cast(sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) as bigint)
                 AS t1,
               cast(sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) as bigint)
                 AS t2
        FROM p)
      SELECT n0, c AS concordant, d AS discordant,
             ${r6Sql("cast(c - d as double) / " +
               "(sqrt(cast(n0 - t1 as double)) * " +
               "sqrt(cast(n0 - t2 as double)))")} AS tau_b
      FROM agg"""),
  )

  /** ODDS RATIO with Wald 95% CI for the 2×2 of weekend exposure ×
    * purchase outcome over the event stream. Weekday is epoch-day mod 7
    * in BOTH engines (1970-01-01 = Thursday ⇒ Sat/Sun ≡ 2/3) — never
    * dayofweek, whose origin differs across engines. The whole test is
    * one conditional-sum pass producing four bigint cells; OR, log-OR,
    * and the CI bounds are a fixed IEEE expression over them. */
  val qOddsRatio: GQuery = GQuery(
    "q_oddsratio",
    (spark, dir) => {
      import spark.implicits._
      val e = Tables.events(spark, dir)
        .select(
          ((datediff(to_date($"ts"), to_date(lit("1970-01-01"))) % 7)
            .isin(2, 3)).as("wknd"),
          ($"event_type" === "purchase").as("pur"))
      val c = e.agg(
        sum(when($"wknd" && $"pur", 1L).otherwise(0L)).as("a"),
        sum(when($"wknd" && !$"pur", 1L).otherwise(0L)).as("b"),
        sum(when(!$"wknd" && $"pur", 1L).otherwise(0L)).as("c"),
        sum(when(!$"wknd" && !$"pur", 1L).otherwise(0L)).as("d"))
      val dd = (s: String) => col(s).cast("double")
      val orr = dd("a") * dd("d") / (dd("b") * dd("c"))
      val se = sqrt(lit(1.0) / dd("a") + lit(1.0) / dd("b") +
        lit(1.0) / dd("c") + lit(1.0) / dd("d"))
      c.select($"a", $"b", $"c", $"d",
        r6(orr).as("odds_ratio"),
        r6(log(orr)).as("log_or"),
        r6(exp(log(orr) - lit(1.96) * se)).as("ci_lo"),
        r6(exp(log(orr) + lit(1.96) * se)).as("ci_hi"))
    },
    Some(s"""
      WITH e AS (
        SELECT (date_diff('day', DATE '1970-01-01',
                 cast(date_trunc('day', ts) as date)) % 7) IN (2, 3)
                 AS wknd,
               event_type = 'purchase' AS pur
        FROM events),
      c AS (
        SELECT cast(sum(CASE WHEN wknd AND pur THEN 1 ELSE 0 END)
                 as bigint) AS a,
               cast(sum(CASE WHEN wknd AND NOT pur THEN 1 ELSE 0 END)
                 as bigint) AS b,
               cast(sum(CASE WHEN NOT wknd AND pur THEN 1 ELSE 0 END)
                 as bigint) AS c,
               cast(sum(CASE WHEN NOT wknd AND NOT pur THEN 1 ELSE 0 END)
                 as bigint) AS d
        FROM e)
      SELECT a, b, c, d,
             ${r6Sql("cast(a as double) * cast(d as double) / " +
               "(cast(b as double) * cast(c as double))")} AS odds_ratio,
             ${r6Sql("ln(cast(a as double) * cast(d as double) / " +
               "(cast(b as double) * cast(c as double)))")} AS log_or,
             ${r6Sql("exp(ln(cast(a as double) * cast(d as double) / " +
               "(cast(b as double) * cast(c as double))) - " +
               "cast(1.96 as double) * " +
               "sqrt(cast(1.0 as double) / cast(a as double) + " +
               "cast(1.0 as double) / cast(b as double) + " +
               "cast(1.0 as double) / cast(c as double) + " +
               "cast(1.0 as double) / cast(d as double)))")} AS ci_lo,
             ${r6Sql("exp(ln(cast(a as double) * cast(d as double) / " +
               "(cast(b as double) * cast(c as double))) + " +
               "cast(1.96 as double) * " +
               "sqrt(cast(1.0 as double) / cast(a as double) + " +
               "cast(1.0 as double) / cast(b as double) + " +
               "cast(1.0 as double) / cast(c as double) + " +
               "cast(1.0 as double) / cast(d as double)))")} AS ci_hi
      FROM c"""),
  )

  /** KRUSKAL–WALLIS H across all five order priorities — the k-group
    * generalization of q_mannwhitney. Average ranks are kept EXACT by
    * doubling (2·rank = 2·cum_below + t + 1, an integer), accumulated
    * per group on the distinct-value axis, so the raw pass is the same
    * combinable per-(value,group) count reduction and the only window
    * rides the distinct-value table. H = 12/(n(n+1))·ΣRᵢ²/nᵢ − 3(n+1)
    * is evaluated with the substitution uᵢ = R2ᵢ/(2n) = Rᵢ/n — which
    * folds a 1/n into s, so the applied coefficient is 12/(n+1) — and
    * the per-group staged terms uᵢ²/nᵢ·n stay ≪ 2³³ (the decimal-staging
    * validity bound, CLAUDE.md round-8 gotcha); the k-row cross-group
    * sum is decimal-staged, hence order-free. Tie correction
    * C = 1 − Σ(t³−t)/(n³−n) and the ε² effect size ride the same
    * aggregates. */
  val qKruskal: GQuery = GQuery(
    "q_kruskal",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
        .select($"o_totalprice".as("v"), $"o_orderpriority".as("pri"))
      val pv = o.groupBy($"v", $"pri").agg(count(lit(1)).as("c"))
      val tv = pv.groupBy($"v").agg(sum($"c").as("t"))
      val wc = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tc = tv.withColumn("cum", coalesce(sum($"t").over(wc), lit(0L)))
      val tot = tc.agg(sum($"t").as("n"),
        sum($"t" * $"t" * $"t" - $"t").as("ties3"))
      val grp = pv.join(tc.select($"v", $"t", $"cum"), Seq("v"))
        .groupBy($"pri")
        .agg(sum($"c").as("ni"),
          sum($"c" * (lit(2L) * $"cum" + $"t" + lit(1L))).as("r2i"))
      val d = (c: String) => col(c).cast("double")
      val ui = d("r2i") / (lit(2.0) * d("n"))
      val s = grp.crossJoin(broadcast(tot))
        .select($"ni", $"n", $"ties3",
          rN(ui * ui / d("ni") * d("n"), 6).as("term"))
        .agg(count(lit(1)).cast("int").as("k"),
          max($"n").as("n"), max($"ties3").as("ties3"),
          sum($"term".cast(org.apache.spark.sql.types.DecimalType(30, 6)))
            .cast("double").as("s"))
      val n = d("n")
      // s already folds a 1/n (s = (1/n)·ΣRᵢ²/nᵢ via the uᵢ = Rᵢ/n
      // substitution), so the classic 12/(n(n+1)) coefficient reduces
      // to 12/(n+1) here. H ≥ 0 is pinned by CausalMetricSpec.
      val h = lit(12.0) / (n + lit(1.0)) * $"s" - lit(3.0) * (n + lit(1.0))
      val cTie = lit(1.0) - d("ties3") / (n * n * n - n)
      s.select($"k", $"n", r6(h).as("h"),
        r6(h / cTie).as("h_adj"),
        r6((h / cTie - ($"k" - lit(1)).cast("double")) /
          (n - $"k".cast("double"))).as("eps2"))
    },
    Some {
      val n = "cast(n as double)"
      val h = s"cast(12.0 as double) / ($n + cast(1.0 as double))" +
        s" * s - cast(3.0 as double) * ($n + cast(1.0 as double))"
      val cTie = s"(cast(1.0 as double) - cast(ties3 as double) / " +
        s"($n * $n * $n - $n))"
      s"""
      WITH o AS (
        SELECT o_totalprice AS v, o_orderpriority AS pri FROM orders),
      pv AS (
        SELECT v, pri, cast(count(*) as bigint) AS c
        FROM o GROUP BY v, pri),
      tv AS (SELECT v, cast(sum(c) as bigint) AS t FROM pv GROUP BY v),
      tc AS (
        SELECT v, t,
               cast(coalesce(sum(t) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 as bigint) AS cum
        FROM tv),
      tot AS (
        SELECT cast(sum(t) as bigint) AS n,
               cast(sum(t*t*t - t) as bigint) AS ties3
        FROM tc),
      grp AS (
        SELECT pri, cast(sum(c) as bigint) AS ni,
               cast(sum(c * (2 * cum + t + 1)) as bigint) AS r2i
        FROM pv JOIN tc USING (v) GROUP BY pri),
      st AS (
        SELECT cast(count(*) as int) AS k,
               max(n) AS n, max(ties3) AS ties3,
               cast(sum(cast(${rNSql(
                 "(cast(r2i as double) / (cast(2.0 as double) * " +
                 "cast(n as double))) * (cast(r2i as double) / " +
                 "(cast(2.0 as double) * cast(n as double))) / " +
                 "cast(ni as double) * cast(n as double)", 6)}
                 as decimal(30,6))) as double) AS s
        FROM grp, tot)
      SELECT k, n, ${r6Sql(h)} AS h,
             ${r6Sql(s"($h) / $cTie")} AS h_adj,
             ${r6Sql(s"(($h) / $cTie - (cast(k as double) - " +
               s"cast(1.0 as double))) / ($n - cast(k as double))")} AS eps2
      FROM st"""
    },
  )

  /** COCHRAN–ARMITAGE trend test: does the share of high-value orders
    * (>$200k) trend monotonically across the ORDERED priority scale
    * 1-URGENT … 5-LOW? Scores wᵢ = 1..5 from the priority's leading
    * digit (cross-engine-identical substring parse). The statistic is
    * kept exact by the ×N clearing trick: T·N = Σwᵢ(aᵢN − nᵢA) is pure
    * int64 (magnitudes ≤ 5·N² ≈ 10¹¹ at sf0.1), and Var(T) needs only
    * the integer moments Σwnᵢ, Σw²nᵢ — so the 5-cell reduction has no
    * float accumulation anywhere; z is one fixed IEEE form. */
  val qArmitage: GQuery = GQuery(
    "q_armitage",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
        .select(substring($"o_orderpriority", 1, 1).cast("long").as("w"),
          when($"o_totalprice" > 200000.0, 1L).otherwise(0L).as("pos"))
      val g = o.groupBy($"w").agg(count(lit(1)).as("ni"),
        sum($"pos").as("ai"))
      val a = g.agg(sum($"ni").as("nn"), sum($"ai").as("aa"),
        sum($"w" * $"ni").as("swn"), sum($"w" * $"w" * $"ni").as("sw2n"),
        sum($"w" * $"ai").as("swa"))
      val d = (c: String) => col(c).cast("double")
      val tn = d("swa") * d("nn") - d("swn") * d("aa")
      val p = d("aa") / d("nn")
      val varTn2 = p * (lit(1.0) - p) *
        (d("nn") * d("sw2n") - d("swn") * d("swn")) * d("nn")
      a.select($"nn".as("n"), $"aa".as("n_pos"),
        r6(p).as("base_rate"),
        r6(tn / d("nn")).as("t_stat"),
        r6(tn / sqrt(varTn2)).as("z"))
    },
    Some {
      val tn = "(cast(swa as double) * cast(nn as double) - " +
        "cast(swn as double) * cast(aa as double))"
      val p = "(cast(aa as double) / cast(nn as double))"
      val varTn2 = s"($p * (cast(1.0 as double) - $p) * " +
        "(cast(nn as double) * cast(sw2n as double) - " +
        "cast(swn as double) * cast(swn as double)) * cast(nn as double))"
      s"""
      WITH o AS (
        SELECT cast(substr(o_orderpriority, 1, 1) as bigint) AS w,
               CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END AS pos
        FROM orders),
      g AS (
        SELECT w, cast(count(*) as bigint) AS ni,
               cast(sum(pos) as bigint) AS ai
        FROM o GROUP BY w),
      a AS (
        SELECT cast(sum(ni) as bigint) AS nn,
               cast(sum(ai) as bigint) AS aa,
               cast(sum(w * ni) as bigint) AS swn,
               cast(sum(w * w * ni) as bigint) AS sw2n,
               cast(sum(w * ai) as bigint) AS swa
        FROM g)
      SELECT nn AS n, aa AS n_pos,
             ${r6Sql(p)} AS base_rate,
             ${r6Sql(s"$tn / cast(nn as double)")} AS t_stat,
             ${r6Sql(s"$tn / sqrt($varTn2)")} AS z
      FROM a"""
    },
  )

  /** WILCOXON SIGNED-RANK test on paired per-customer revenue: total
    * order value (exact integer cents) in the early half of the history
    * (before 1995-01-01) vs the late half, customers active in both.
    * Standard zero-drop; |d| average ranks kept EXACT by doubling on
    * the distinct-|d| axis (2·avgrank = 2·cum_below + t + 1 — the
    * q_kruskal contract, and the same RankAtScaleSpec swap applies at
    * scale), so W⁺ = Σ₊avgrank is an exact integer half. The normal
    * approximation uses the tie-corrected variance
    * n(n+1)(2n+1)/24 − Σ(t³−t)/48. Effect size r = z/√n. Differences
    * are integer cents, so every rank input is engine-exact. */
  val qWilcoxon: GQuery = GQuery(
    "q_wilcoxon",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
        .select($"o_custkey",
          floor($"o_totalprice" * lit(100.0) + lit(0.5)).cast("long")
            .as("cents"),
          ($"o_orderdate" < lit("1995-01-01").cast("timestamp_ntz"))
            .as("early"))
      val g = o.groupBy($"o_custkey")
        .agg(sum(when($"early", $"cents").otherwise(0L)).as("c1"),
          sum(when(!$"early", $"cents").otherwise(0L)).as("c2"),
          sum(when($"early", 1L).otherwise(0L)).as("n1"),
          sum(when(!$"early", 1L).otherwise(0L)).as("n2"))
      val p = g.filter($"n1" > 0 && $"n2" > 0)
        .select(($"c2" - $"c1").as("d")).filter($"d" =!= 0L)
      val v = p.groupBy(abs($"d").as("ad"))
        .agg(count(lit(1)).as("t"),
          sum(when($"d" > 0, 1L).otherwise(0L)).as("tpos"))
      val wB = Window.orderBy($"ad")
        .rowsBetween(Window.unboundedPreceding, -1)
      val c = v.withColumn("cum", coalesce(sum($"t").over(wB), lit(0L)))
      val a = c.agg(sum($"t").as("n"),
        sum($"tpos" * (lit(2L) * $"cum" + $"t" + lit(1L))).as("w2"),
        sum($"t" * $"t" * $"t" - $"t").as("ties3"))
      val d = (s: String) => col(s).cast("double")
      val n = d("n")
      val wPlus = d("w2") / lit(2.0)
      val mu = n * (n + lit(1.0)) / lit(4.0)
      val sig2 = n * (n + lit(1.0)) * (lit(2.0) * n + lit(1.0)) / lit(24.0) -
        d("ties3") / lit(48.0)
      a.select($"n".as("n_pairs"), wPlus.as("w_plus"),
        r6((wPlus - mu) / sqrt(sig2)).as("z"),
        r6((wPlus - mu) / sqrt(sig2) / sqrt(n)).as("r_effect"))
    },
    Some {
      val z = "((cast(w2 as double) / cast(2.0 as double) - " +
        "cast(n as double) * (cast(n as double) + cast(1.0 as double)) / " +
        "cast(4.0 as double)) / " +
        "sqrt(cast(n as double) * (cast(n as double) + cast(1.0 as double)) * " +
        "(cast(2.0 as double) * cast(n as double) + cast(1.0 as double)) / " +
        "cast(24.0 as double) - cast(ties3 as double) / cast(48.0 as double)))"
      s"""
      WITH o AS (
        SELECT o_custkey,
               cast(floor(o_totalprice * 100.0 + 0.5) as bigint) AS cents,
               (o_orderdate < TIMESTAMP '1995-01-01') AS early
        FROM orders),
      g AS (
        SELECT o_custkey,
               cast(sum(CASE WHEN early THEN cents ELSE 0 END) as bigint) AS c1,
               cast(sum(CASE WHEN NOT early THEN cents ELSE 0 END) as bigint) AS c2,
               sum(CASE WHEN early THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS n2
        FROM o GROUP BY o_custkey),
      p AS (
        SELECT c2 - c1 AS d FROM g
        WHERE n1 > 0 AND n2 > 0 AND c2 - c1 <> 0),
      v AS (
        SELECT abs(d) AS ad, cast(count(*) as bigint) AS t,
               cast(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) as bigint) AS tpos
        FROM p GROUP BY abs(d)),
      c AS (
        SELECT t, tpos,
               cast(coalesce(sum(t) OVER (ORDER BY ad
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 as bigint) AS cum
        FROM v),
      a AS (
        SELECT cast(sum(t) as bigint) AS n,
               cast(sum(tpos * (2 * cum + t + 1)) as bigint) AS w2,
               cast(sum(t * t * t - t) as bigint) AS ties3
        FROM c)
      SELECT n AS n_pairs,
             cast(w2 as double) / cast(2.0 as double) AS w_plus,
             ${r6Sql(z)} AS z,
             ${r6Sql(s"$z / sqrt(cast(n as double))")} AS r_effect
      FROM a"""
    },
  )

  /** FRIEDMAN TEST: do the five order priorities rank consistently on
    * monthly revenue? Blocks = order months, treatments = priorities;
    * within-block average ranks of the (exact integer cents) block
    * totals are computed by a per-block PAIR COUNT (k=5, so the
    * within-block self-join is 25 rows per block — never a global
    * window), doubled to stay integer under ties. Only complete blocks
    * (all 5 priorities present) enter, counted in the output. The
    * statistic Q = 12/(n·k·(k+1))·ΣRⱼ² − 3n(k+1) and Kendall's
    * W = Q/(n(k−1)) close in fixed IEEE arithmetic; R2ⱼ² terms stay
    * ≪ 2³³ (R2ⱼ ≤ 2·k·n ≈ 10³). */
  val qFriedman: GQuery = GQuery(
    "q_friedman",
    (spark, dir) => {
      import spark.implicits._
      val b = Tables.orders(spark, dir)
        .select(date_trunc("month", $"o_orderdate").cast("date").as("m"),
          $"o_orderpriority".as("pri"),
          floor($"o_totalprice" * lit(100.0) + lit(0.5)).cast("long")
            .as("cents"))
        .groupBy($"m", $"pri").agg(sum($"cents").as("v"))
      val full = b.groupBy($"m").agg(count(lit(1)).as("kk"))
        .filter($"kk" === 5).select($"m")
      val bb = b.join(full, "m")
      // doubled average rank inside each 5-row block via pair counts:
      // 2·rank = 2·(# strictly below) + (# ties incl self) + 1
      val r2 = bb.as("x").join(bb.as("y"), col("x.m") === col("y.m"))
        .groupBy(col("x.m").as("m"), col("x.pri").as("pri"))
        .agg((lit(2L) * sum(when(col("y.v") < col("x.v"), 1L).otherwise(0L)) +
          sum(when(col("y.v") === col("x.v"), 1L).otherwise(0L)) + lit(1L))
          .as("r2"))
      val rj = r2.groupBy($"pri")
        .agg(sum($"r2").as("r2j"), count(lit(1)).as("nb"))
      val d = (s: String) => col(s).cast("double")
      val a = rj.agg(max($"nb").as("n"), count(lit(1)).cast("long").as("k"),
        sum($"r2j" * $"r2j").as("sr2"))
      val n = d("n"); val k = d("k")
      // ranks were doubled: Rj = r2j/2, so ΣRj² = sr2/4
      val q = lit(12.0) / (n * k * (k + lit(1.0))) * (d("sr2") / lit(4.0)) -
        lit(3.0) * n * (k + lit(1.0))
      a.select($"n".as("n_blocks"), $"k".cast("int").as("k"),
        r6(q).as("q_stat"), r6(q / (n * (k - lit(1.0)))).as("kendall_w"))
    },
    Some {
      val q = "(cast(12.0 as double) / (cast(n as double) * " +
        "cast(k as double) * (cast(k as double) + cast(1.0 as double))) * " +
        "(cast(sr2 as double) / cast(4.0 as double)) - " +
        "cast(3.0 as double) * cast(n as double) * " +
        "(cast(k as double) + cast(1.0 as double)))"
      s"""
      WITH b AS (
        SELECT cast(date_trunc('month', o_orderdate) as date) AS m,
               o_orderpriority AS pri,
               cast(sum(cast(floor(o_totalprice * 100.0 + 0.5) as bigint))
                 as bigint) AS v
        FROM orders GROUP BY 1, 2),
      full_b AS (SELECT m FROM b GROUP BY m HAVING count(*) = 5),
      bb AS (SELECT b.* FROM b JOIN full_b USING (m)),
      r2 AS (
        SELECT x.m, x.pri,
               cast(2 * sum(CASE WHEN y.v < x.v THEN 1 ELSE 0 END) +
                 sum(CASE WHEN y.v = x.v THEN 1 ELSE 0 END) + 1
                 as bigint) AS r2
        FROM bb x JOIN bb y ON x.m = y.m
        GROUP BY x.m, x.pri),
      rj AS (
        SELECT pri, cast(sum(r2) as bigint) AS r2j,
               cast(count(*) as bigint) AS nb
        FROM r2 GROUP BY pri),
      a AS (
        SELECT max(nb) AS n, cast(count(*) as bigint) AS k,
               cast(sum(r2j * r2j) as bigint) AS sr2
        FROM rj)
      SELECT n AS n_blocks, cast(k as int) AS k,
             ${r6Sql(q)} AS q_stat,
             ${r6Sql(s"$q / (cast(n as double) * (cast(k as double) - " +
               "cast(1.0 as double)))")} AS kendall_w
      FROM a"""
    },
  )

  /** McNEMAR'S TEST on paired binary outcomes: per (user, epoch-week)
    * pair, did the user click early in the week (first 3 epoch-days)
    * vs late (the remaining 4)? Both the week key and the day split
    * come from pure INTEGER epoch-day arithmetic (s div 86400, div/mod
    * 7) — the CLAUDE.md weekday contract, identical in both engines
    * (a whole-history half split is degenerate here: every active user
    * clicks in both halves, leaving the discordant cells empty). The
    * test needs only the discordant cells b (early-only) and c
    * (late-only): χ² = (b−c)²/(b+c), with the continuity-corrected
    * variant alongside. One combinable per-pair reduction, one 1-row
    * finish — no window at all. */
  val qMcnemar: GQuery = GQuery(
    "q_mcnemar",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir).filter($"event_type" === "click")
        .select($"user_id", expr("unix_timestamp(ts) div 86400").as("d"))
      val g = ev
        .select($"user_id", expr("d div 7").as("wk"),
          expr("d % 7").as("dow"))
        .groupBy($"user_id", $"wk")
        .agg(max(when($"dow" < 3, 1L).otherwise(0L)).as("e"),
          max(when($"dow" >= 3, 1L).otherwise(0L)).as("l"))
      val cells = g.agg(
        sum(when($"e" === 1L && $"l" === 1L, 1L).otherwise(0L)).as("both"),
        sum(when($"e" === 1L && $"l" === 0L, 1L).otherwise(0L)).as("b"),
        sum(when($"e" === 0L && $"l" === 1L, 1L).otherwise(0L)).as("c"))
      val d = (s: String) => col(s).cast("double")
      val chi2 = (d("b") - d("c")) * (d("b") - d("c")) / (d("b") + d("c"))
      val chi2cc = (abs(d("b") - d("c")) - lit(1.0)) *
        (abs(d("b") - d("c")) - lit(1.0)) / (d("b") + d("c"))
      cells.select($"both".as("n_both"), $"b".as("n_early_only"),
        $"c".as("n_late_only"), r6(chi2).as("chi2"), r6(chi2cc).as("chi2_cc"))
    },
    Some {
      val chi2 = "((cast(b as double) - cast(c as double)) * " +
        "(cast(b as double) - cast(c as double)) / " +
        "(cast(b as double) + cast(c as double)))"
      val chi2cc = "((abs(cast(b as double) - cast(c as double)) - " +
        "cast(1.0 as double)) * " +
        "(abs(cast(b as double) - cast(c as double)) - " +
        "cast(1.0 as double)) / " +
        "(cast(b as double) + cast(c as double)))"
      s"""
      WITH ev AS (
        SELECT user_id,
               cast(epoch(date_trunc('second', ts)) as bigint) // 86400 AS d
        FROM events WHERE event_type = 'click'),
      g AS (
        SELECT user_id, d // 7 AS wk,
               max(CASE WHEN d % 7 < 3 THEN 1 ELSE 0 END) AS e,
               max(CASE WHEN d % 7 >= 3 THEN 1 ELSE 0 END) AS l
        FROM ev GROUP BY user_id, d // 7),
      cells AS (
        SELECT cast(sum(CASE WHEN e = 1 AND l = 1 THEN 1 ELSE 0 END)
                 as bigint) AS n11,
               cast(sum(CASE WHEN e = 1 AND l = 0 THEN 1 ELSE 0 END)
                 as bigint) AS b,
               cast(sum(CASE WHEN e = 0 AND l = 1 THEN 1 ELSE 0 END)
                 as bigint) AS c
        FROM g)
      SELECT n11 AS n_both, b AS n_early_only, c AS n_late_only,
             ${r6Sql(chi2)} AS chi2, ${r6Sql(chi2cc)} AS chi2_cc
      FROM cells"""
    },
  )

  /** DUNN'S POST-HOC test — the rank-based pairwise follow-up to
    * q_kruskal (exactly as q_tukey_hsd follows q_anova): which priority
    * pairs actually differ in totalprice rank? Rides q_kruskal's
    * collapsed-rank infrastructure verbatim: per-distinct-value counts,
    * ONE cumulative window on the bounded value table, integer rank sums
    * r2i = 2·ΣRᵢ (so mean ranks are one exact division); the k(k−1)/2
    * group pairs are a 10-row broadcast self-join. zᵢⱼ = (R̄ᵢ − R̄ⱼ) /
    * √(A(1/nᵢ + 1/nⱼ)) with the tie-corrected variance A = (N(N+1) −
    * ties3/(N−1))/12 — all moments integer, z one fixed IEEE expression.
    * The Bonferroni gate compares |z| to the α=0.05, m=10 critical value
    * 2.807034 (a shared literal, not a quantile call — neither engine
    * has Φ⁻¹). At 100 TB: same swap story as q_kruskal (the only
    * unpartitioned window rides the collapsed per-value table;
    * RankAtScaleSpec's range-partitioned two-pass form is bit-identical). */
  val qDunnTest: GQuery = GQuery(
    "q_dunn_test",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
        .select($"o_totalprice".as("v"), $"o_orderpriority".as("pri"))
      val pv = o.groupBy($"v", $"pri").agg(count(lit(1)).as("c"))
      val tv = pv.groupBy($"v").agg(sum($"c").as("t"))
      val wc = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tc = tv.withColumn("cum", coalesce(sum($"t").over(wc), lit(0L)))
      val tot = tc.agg(sum($"t").as("n"),
        sum($"t" * $"t" * $"t" - $"t").as("ties3"))
      val grp = pv.join(tc.select($"v", $"t", $"cum"), Seq("v"))
        .groupBy($"pri")
        .agg(sum($"c").as("ni"),
          sum($"c" * (lit(2L) * $"cum" + $"t" + lit(1L))).as("r2i"))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      val a = grp.select($"pri".as("pri_a"), $"ni".as("na"), $"r2i".as("ra"))
      val b = grp.select($"pri".as("pri_b"), $"ni".as("nb"), $"r2i".as("rb"))
      val mra = d($"ra") / (lit(2.0) * d($"na"))
      val mrb = d($"rb") / (lit(2.0) * d($"nb"))
      val aVar = (d($"n") * (d($"n") + lit(1.0)) -
        d($"ties3") / (d($"n") - lit(1.0))) / lit(12.0)
      val z = (mra - mrb) /
        sqrt(aVar * (lit(1.0) / d($"na") + lit(1.0) / d($"nb")))
      a.join(broadcast(b), $"pri_a" < $"pri_b")
        .crossJoin(broadcast(tot))
        .select($"pri_a", $"pri_b", $"na", $"nb",
          r6(mra).as("mean_rank_a"), r6(mrb).as("mean_rank_b"),
          r6(z).as("z"),
          (abs(r6(z)) > lit(2.807034)).as("reject_bonf"))
        .orderBy($"pri_a", $"pri_b")
    },
    Some {
      val mra = "cast(ra as double) / (cast(2.0 as double) * cast(na as double))"
      val mrb = "cast(rb as double) / (cast(2.0 as double) * cast(nb as double))"
      val aVar = "((cast(n as double) * (cast(n as double) + " +
        "cast(1.0 as double)) - cast(ties3 as double) / " +
        "(cast(n as double) - cast(1.0 as double))) / cast(12.0 as double))"
      val z = s"(($mra) - ($mrb)) / sqrt($aVar * " +
        "(cast(1.0 as double) / cast(na as double) + " +
        "cast(1.0 as double) / cast(nb as double)))"
      s"""
      WITH o AS (
        SELECT o_totalprice AS v, o_orderpriority AS pri FROM orders),
      pv AS (
        SELECT v, pri, cast(count(*) as bigint) AS c
        FROM o GROUP BY v, pri),
      tv AS (SELECT v, cast(sum(c) as bigint) AS t FROM pv GROUP BY v),
      tc AS (
        SELECT v, t,
               cast(coalesce(sum(t) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 as bigint) AS cum
        FROM tv),
      tot AS (
        SELECT cast(sum(t) as bigint) AS n,
               cast(sum(t*t*t - t) as bigint) AS ties3
        FROM tc),
      grp AS (
        SELECT pri, cast(sum(c) as bigint) AS ni,
               cast(sum(c * (2 * cum + t + 1)) as bigint) AS r2i
        FROM pv JOIN tc USING (v) GROUP BY pri)
      SELECT a.pri AS pri_a, b.pri AS pri_b,
             a.ni AS na, b.ni AS nb,
             ${r6Sql(mra.replace("ra", "a.r2i").replace("na", "a.ni"))}
               AS mean_rank_a,
             ${r6Sql(mrb.replace("rb", "b.r2i").replace("nb", "b.ni"))}
               AS mean_rank_b,
             ${r6Sql(z.replace("ra", "a.r2i").replace("na", "a.ni")
                .replace("rb", "b.r2i").replace("nb", "b.ni"))} AS z,
             (abs(${r6Sql(z.replace("ra", "a.r2i").replace("na", "a.ni")
                .replace("rb", "b.r2i").replace("nb", "b.ni"))}) >
               cast(2.807034 as double)) AS reject_bonf
      FROM grp a JOIN grp b ON a.pri < b.pri
      CROSS JOIN tot
      ORDER BY pri_a, pri_b"""
    },
  )

  /** COCHRAN'S Q — the k-treatment extension of q_mcnemar (and the
    * binary sibling of q_friedman): do view / click / purchase
    * "activity marks" differ in prevalence across matched blocks?
    * Blocks are (user, epoch-week) pairs (integer epoch-day div 7, the
    * CLAUDE.md week contract), xᵢⱼ = 1 iff the user did event type j
    * that week. Q = (k−1)(k·ΣCⱼ² − T²) / (k·T − ΣRᵢ²) is INTEGER
    * arithmetic end to end (column totals Cⱼ, row totals Rᵢ, grand
    * total T = ΣCⱼ = ΣRᵢ) — one distinct + two combinable aggs, a
    * single IEEE division at the end. Blocks with all-zero rows never
    * enter (no event → no row); all-full blocks contribute zero to the
    * denominator, exactly as the statistic requires. */
  val qCochranQ: GQuery = GQuery(
    "q_cochran_q",
    (spark, dir) => {
      import spark.implicits._
      val k = 3
      val marks = Tables.events(spark, dir)
        .filter($"event_type".isin("view", "click", "purchase"))
        .select($"user_id",
          expr("datediff(to_date(ts), date '1970-01-01') div 7").as("wk"),
          $"event_type".as("et"))
        .distinct()
      val rows = marks.groupBy($"user_id", $"wk")
        .agg(count(lit(1)).as("ri"))
      val rAgg = rows.agg(count(lit(1)).as("n_blocks"),
        sum($"ri").as("t_marks"), sum($"ri" * $"ri").as("sr2"))
      val cols = marks.groupBy($"et").agg(count(lit(1)).as("cj"))
      val cAgg = cols.agg(
        sum(when($"et" === "view", $"cj").otherwise(0L)).as("c_view"),
        sum(when($"et" === "click", $"cj").otherwise(0L)).as("c_click"),
        sum(when($"et" === "purchase", $"cj").otherwise(0L)).as("c_purchase"),
        sum($"cj" * $"cj").as("sc2"))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      val q = (lit((k - 1).toDouble) *
        (lit(k.toDouble) * d($"sc2") - d($"t_marks") * d($"t_marks"))) /
        (lit(k.toDouble) * d($"t_marks") - d($"sr2"))
      rAgg.crossJoin(broadcast(cAgg))
        .select($"n_blocks", $"t_marks", $"c_view", $"c_click",
          $"c_purchase", r6(q).as("q_stat"))
    },
    Some {
      val q = "(cast(2.0 as double) * (cast(3.0 as double) * " +
        "cast(sc2 as double) - cast(t_marks as double) * " +
        "cast(t_marks as double))) / (cast(3.0 as double) * " +
        "cast(t_marks as double) - cast(sr2 as double))"
      s"""
      WITH marks AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01',
                 cast(date_trunc('second', ts) as date)) // 7 AS wk,
               event_type AS et
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')),
      r AS (
        SELECT cast(count(*) as bigint) AS ri
        FROM marks GROUP BY user_id, wk),
      ragg AS (
        SELECT cast(count(*) as bigint) AS n_blocks,
               cast(sum(ri) as bigint) AS t_marks,
               cast(sum(ri * ri) as bigint) AS sr2
        FROM r),
      c AS (SELECT et, cast(count(*) as bigint) AS cj
            FROM marks GROUP BY et),
      cagg AS (
        SELECT cast(sum(CASE WHEN et = 'view' THEN cj ELSE 0 END)
                 as bigint) AS c_view,
               cast(sum(CASE WHEN et = 'click' THEN cj ELSE 0 END)
                 as bigint) AS c_click,
               cast(sum(CASE WHEN et = 'purchase' THEN cj ELSE 0 END)
                 as bigint) AS c_purchase,
               cast(sum(cj * cj) as bigint) AS sc2
        FROM c)
      SELECT n_blocks, t_marks, c_view, c_click, c_purchase,
             ${r6Sql(q)} AS q_stat
      FROM ragg CROSS JOIN cagg"""
    },
  )

  /** PAGE'S TREND TEST for ORDERED alternatives — q_friedman's
    * directional sibling: the priority scale 1-URGENT…5-LOW is ORDERED,
    * so instead of the omnibus "any difference" Q we test the specific
    * monotone alternative with L = Σⱼ wⱼRⱼ (wⱼ = the priority's leading
    * digit 1..5 — the q_armitage substring-parse score; Rⱼ = rank sum of
    * priority j across complete monthly blocks). Reuses q_friedman's
    * machinery verbatim: monthly cents totals, within-block DOUBLED avg
    * ranks from 25-row-per-block pair counts (so 2L = Σwⱼ·r2ⱼ is pure
    * int64 and L is exact), complete-block filter. Under H₀,
    * E[L] = nk(k+1)²/4 and Var[L] = nk²(k+1)(k²−1)/144 (the classic
    * no-ties form — block cents totals never tie in practice, and the
    * rank machinery would still be exact if they did); z is one fixed
    * IEEE expression over integers. */
  val qPageTrend: GQuery = GQuery(
    "q_page_trend",
    (spark, dir) => {
      import spark.implicits._
      val b = Tables.orders(spark, dir)
        .select(date_trunc("month", $"o_orderdate").cast("date").as("m"),
          $"o_orderpriority".as("pri"),
          floor($"o_totalprice" * lit(100.0) + lit(0.5)).cast("long")
            .as("cents"))
        .groupBy($"m", $"pri").agg(sum($"cents").as("v"))
      val full = b.groupBy($"m").agg(count(lit(1)).as("kk"))
        .filter($"kk" === 5).select($"m")
      val bb = b.join(full, "m")
      val r2 = bb.as("x").join(bb.as("y"), col("x.m") === col("y.m"))
        .groupBy(col("x.m").as("m"), col("x.pri").as("pri"))
        .agg((lit(2L) * sum(when(col("y.v") < col("x.v"), 1L).otherwise(0L)) +
          sum(when(col("y.v") === col("x.v"), 1L).otherwise(0L)) + lit(1L))
          .as("r2"))
      val rj = r2
        .withColumn("w", expr("cast(substring(pri, 1, 1) as int)").cast("long"))
        .groupBy($"pri", $"w")
        .agg(sum($"r2").as("r2j"), count(lit(1)).as("nb"))
      val a = rj.agg(max($"nb").as("n"), count(lit(1)).cast("long").as("k"),
        sum($"w" * $"r2j").as("l2"))
      val d = (s: String) => col(s).cast("double")
      val n = d("n"); val k = d("k")
      val lStat = d("l2") / lit(2.0)
      val eL = n * k * (k + lit(1.0)) * (k + lit(1.0)) / lit(4.0)
      val varL = n * k * k * (k + lit(1.0)) * (k * k - lit(1.0)) / lit(144.0)
      a.select($"n".as("n_blocks"), $"k".cast("int").as("k"),
        r6(lStat).as("l_stat"), r6((lStat - eL) / sqrt(varL)).as("z"))
    },
    Some {
      val n = "cast(n as double)"; val k = "cast(k as double)"
      val l = "(cast(l2 as double) / cast(2.0 as double))"
      val eL = s"($n * $k * ($k + cast(1.0 as double)) * " +
        s"($k + cast(1.0 as double)) / cast(4.0 as double))"
      val varL = s"($n * $k * $k * ($k + cast(1.0 as double)) * " +
        s"($k * $k - cast(1.0 as double)) / cast(144.0 as double))"
      s"""
      WITH b AS (
        SELECT cast(date_trunc('month', o_orderdate) as date) AS m,
               o_orderpriority AS pri,
               cast(sum(cast(floor(o_totalprice * 100.0 + 0.5) as bigint))
                 as bigint) AS v
        FROM orders GROUP BY 1, 2),
      full_b AS (SELECT m FROM b GROUP BY m HAVING count(*) = 5),
      bb AS (SELECT b.* FROM b JOIN full_b USING (m)),
      r2 AS (
        SELECT x.m, x.pri,
               cast(2 * sum(CASE WHEN y.v < x.v THEN 1 ELSE 0 END) +
                 sum(CASE WHEN y.v = x.v THEN 1 ELSE 0 END) + 1
                 as bigint) AS r2
        FROM bb x JOIN bb y ON x.m = y.m
        GROUP BY x.m, x.pri),
      rj AS (
        SELECT pri, cast(substr(pri, 1, 1) as bigint) AS w,
               cast(sum(r2) as bigint) AS r2j,
               cast(count(*) as bigint) AS nb
        FROM r2 GROUP BY pri),
      a AS (
        SELECT max(nb) AS n, cast(count(*) as bigint) AS k,
               cast(sum(w * r2j) as bigint) AS l2
        FROM rj)
      SELECT n AS n_blocks, cast(k as int) AS k,
             ${r6Sql(l)} AS l_stat,
             ${r6Sql(s"($l - $eL) / sqrt($varL)")} AS z
      FROM a"""
    },
  )

  /** CLIFF'S DELTA — the distribution-free effect size q_mannwhitney's z
    * cannot convey (z grows with n even for trivial shifts; δ does not):
    * δ = (#{x>y} − #{x<y}) / (n₁n₂) over the same 1-URGENT vs 5-LOW
    * totalprice comparison, computed from the SAME collapsed
    * per-distinct-value count table — #{x>y} = Σ c1ᵥ·cum2(<v) and
    * #{x<y} = Σ c1ᵥ·(n₂ − cum2 − c2ᵥ) are pure int64, so δ is one IEEE
    * division and the dominance counts are themselves auditable output.
    * The magnitude label uses Romano's conventional cuts on the r6'd δ
    * (|δ| < .147 negligible / .33 small / .474 medium / else large) —
    * identical CASE in both engines. */
  val qCliffsDelta: GQuery = GQuery(
    "q_cliffs_delta",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
        .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
        .select($"o_totalprice".as("v"), $"o_orderpriority".as("pri"))
      val g = o.groupBy($"v")
        .agg(sum(when($"pri" === "1-URGENT", 1L).otherwise(0L)).as("c1"),
          sum(when($"pri" === "5-LOW", 1L).otherwise(0L)).as("c2"))
      val wBelow = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val a = g
        .withColumn("cum2", coalesce(sum($"c2").over(wBelow), lit(0L)))
        .withColumn("n2all", sum($"c2").over(Window.partitionBy()))
        .agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
          sum($"c1" * $"cum2").as("gt"),
          sum($"c1" * ($"n2all" - $"cum2" - $"c2")).as("lt"))
      val d = (c: String) => col(c).cast("double")
      val delta = r6((d("gt") - d("lt")) / (d("n1") * d("n2")))
      a.select($"n1", $"n2", $"gt", $"lt", delta.as("delta"),
        when(abs(delta) < 0.147, "negligible")
          .when(abs(delta) < 0.33, "small")
          .when(abs(delta) < 0.474, "medium")
          .otherwise("large").as("magnitude"))
    },
    Some {
      val delta = rNSql("(cast(gt as double) - cast(lt as double)) / " +
        "(cast(n1 as double) * cast(n2 as double))", 6)
      s"""
      WITH o AS (
        SELECT o_totalprice AS v, o_orderpriority AS pri
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      g AS (
        SELECT v,
               cast(sum(CASE WHEN pri = '1-URGENT' THEN 1 ELSE 0 END)
                 as bigint) AS c1,
               cast(sum(CASE WHEN pri = '5-LOW' THEN 1 ELSE 0 END)
                 as bigint) AS c2
        FROM o GROUP BY v),
      c AS (
        SELECT c1, c2,
               cast(coalesce(sum(c2) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 as bigint) AS cum2,
               cast(sum(c2) OVER () as bigint) AS n2all
        FROM g),
      a AS (
        SELECT cast(sum(c1) as bigint) AS n1,
               cast(sum(c2) as bigint) AS n2,
               cast(sum(c1 * cum2) as bigint) AS gt,
               cast(sum(c1 * (n2all - cum2 - c2)) as bigint) AS lt
        FROM c)
      SELECT n1, n2, gt, lt, $delta AS delta,
             CASE WHEN abs($delta) < cast(0.147 as double) THEN 'negligible'
                  WHEN abs($delta) < cast(0.33 as double) THEN 'small'
                  WHEN abs($delta) < cast(0.474 as double) THEN 'medium'
                  ELSE 'large' END AS magnitude
      FROM a"""
    },
  )

  /** TWO-SAMPLE CRAMÉR–VON MISES — q_ks_test's integral companion (the
    * KS D is the worst single point; T integrates the whole ECDF gap):
    * T = n·m/(n+m)² · Σₖ (nₖ+mₖ)·(Fₖ−Gₖ)² over the pooled DISTINCT
    * value table (the same collapsed-counts scale shape — the only
    * unpartitioned window rides |distinct values|). Determinism: cum
    * counts are int64, each (Fₖ−Gₖ) = (m·cumxₖ − n·cumyₖ)/(nm) is one
    * IEEE division of exact integers, each term is ≤ nₖ+mₖ (< 2³³ —
    * the staging validity bound) and is 12-dp-quantized into the
    * decimal-staged sum (term count is |distinct values|, so the
    * q_cond_entropy tiny-and-numerous rule applies). */
  val qCvm2: GQuery = GQuery(
    "q_cvm2",
    (spark, dir) => {
      import spark.implicits._
      val dec12 = org.apache.spark.sql.types.DecimalType(30, 12)
      val o = Tables.orders(spark, dir)
        .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
        .select($"o_totalprice".as("v"), $"o_orderpriority".as("pri"))
      val g = o.groupBy($"v")
        .agg(sum(when($"pri" === "1-URGENT", 1L).otherwise(0L)).as("cx"),
          sum(when($"pri" === "5-LOW", 1L).otherwise(0L)).as("cy"))
      val wCum = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      val c = g
        .withColumn("cumx", sum($"cx").over(wCum))
        .withColumn("cumy", sum($"cy").over(wCum))
        .withColumn("n", sum($"cx").over(wAll))
        .withColumn("m", sum($"cy").over(wAll))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      val fg = d($"m" * $"cumx" - $"n" * $"cumy") / d($"n" * $"m")
      val a = c.select($"n", $"m",
          rN(d($"cx" + $"cy") * fg * fg, 12).as("t"))
        .groupBy($"n", $"m")
        .agg(sum($"t".cast(dec12)).cast("double").as("s"))
      a.select($"n", $"m",
        r6(d($"n") * d($"m") / (d($"n" + $"m") * d($"n" + $"m")) * $"s")
          .as("t_stat"))
    },
    Some {
      val fg = "(cast(m * cumx - n * cumy as double) / " +
        "cast(n * m as double))"
      s"""
      WITH o AS (
        SELECT o_totalprice AS v, o_orderpriority AS pri
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      g AS (
        SELECT v,
               cast(sum(CASE WHEN pri = '1-URGENT' THEN 1 ELSE 0 END)
                 as bigint) AS cx,
               cast(sum(CASE WHEN pri = '5-LOW' THEN 1 ELSE 0 END)
                 as bigint) AS cy
        FROM o GROUP BY v),
      c AS (
        SELECT cx, cy,
               cast(sum(cx) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 as bigint) AS cumx,
               cast(sum(cy) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 as bigint) AS cumy,
               cast(sum(cx) OVER () as bigint) AS n,
               cast(sum(cy) OVER () as bigint) AS m
        FROM g),
      a AS (
        SELECT n, m,
               cast(sum(cast(${rNSql(
                 s"cast(cx + cy as double) * $fg * $fg", 12)}
                 as decimal(30,12))) as double) AS s
        FROM c GROUP BY n, m)
      SELECT n, m,
             ${r6Sql("cast(n as double) * cast(m as double) / " +
               "(cast(n + m as double) * cast(n + m as double)) * s")}
               AS t_stat
      FROM a"""
    },
  )

  /** MOOD'S MEDIAN TEST across the 25 part brands: are the brand
    * retail-price medians homogeneous? The grand median comes from the
    * COLLAPSED distinct-cents table (exact integer order statistics —
    * rank (N+1)÷2 and (N+2)÷2 summed, so the even-count midpoint stays
    * in exact half-cent units; the one-ulp interpolated-median hazard
    * never appears), broadcast as a 1-row scalar. Each brand's
    * above/below counts are exact int64 from the same collapsed pass;
    * the 2×25 chi-square accumulates per-brand IEEE terms at 9 dp
    * through a decimal-staged sum. The only unpartitioned window rides
    * the distinct-value axis (~|distinct cents|), the RankAtScaleSpec
    * two-pass prefix shape at 100 TB. */
  val qMoodsMedian: GQuery = GQuery(
    "q_moods_median",
    (spark, dir) => {
      import spark.implicits._
      val g = Tables.part(spark, dir)
        .select($"p_brand",
          floor($"p_retailprice" * lit(100.0) + lit(0.5))
            .cast("long").as("cents"))
        .groupBy($"p_brand", $"cents").agg(count(lit(1)).as("c"))
      val cd = g.groupBy($"cents").agg(sum($"c").as("cc"))
        .withColumn("cum", sum($"cc").over(Window.orderBy($"cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nn", sum($"cc").over(Window.partitionBy()))
      val med = cd.agg(
        min(when($"cum" >= expr("(nn + 1) div 2"), $"cents")).as("lo"),
        min(when($"cum" >= expr("(nn + 2) div 2"), $"cents")).as("hi"),
        max($"nn").as("n"))
        .select(($"lo" + $"hi").as("med2"), $"n")
      val ab = g.crossJoin(broadcast(med))
        .groupBy($"p_brand", $"med2", $"n")
        .agg(sum(when($"cents" * 2 > $"med2", $"c").otherwise(0L)).as("a"),
          sum($"c").as("t"))
        .withColumn("ba", sum($"a").over(Window.partitionBy()))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      val ea = d($"t") * d($"ba") / d($"n")
      val eb = d($"t") * (d($"n") - d($"ba")) / d($"n")
      val term = (d($"a") - ea) * (d($"a") - ea) / ea +
        (d($"t" - $"a") - eb) * (d($"t" - $"a") - eb) / eb
      val agg = ab.groupBy($"med2", $"n")
        .agg(count(lit(1)).cast("int").as("k"),
          sum(rN(term, 9).cast(DecimalType(30, 9)))
            .cast("double").as("chi2"))
      agg.select($"k", $"n",
        r6(d($"med2") / lit(200.0)).as("median_price"),
        r6($"chi2").as("chi2"),
        ($"k" - lit(1)).cast("int").as("df"))
    },
    Some {
      val ea = "(cast(t as double) * cast(ba as double) / " +
        "cast(n as double))"
      val eb = "(cast(t as double) * (cast(n as double) - " +
        "cast(ba as double)) / cast(n as double))"
      val term = s"((cast(a as double) - $ea) * (cast(a as double) - " +
        s"$ea) / $ea + (cast(t - a as double) - $eb) * " +
        s"(cast(t - a as double) - $eb) / $eb)"
      s"""
      WITH g AS (
        SELECT p_brand,
               cast(floor(p_retailprice * cast(100.0 as double) +
                 cast(0.5 as double)) as bigint) AS cents,
               cast(count(*) as bigint) AS c
        FROM part GROUP BY p_brand, cents),
      cd AS (
        SELECT cents, cast(sum(c) as bigint) AS cc
        FROM g GROUP BY cents),
      cum AS (
        SELECT cents,
               cast(sum(cc) OVER (ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 as bigint) AS cum,
               cast(sum(cc) OVER () as bigint) AS nn
        FROM cd),
      med AS (
        SELECT cast(min(CASE WHEN cum >= (nn + 1) // 2 THEN cents END) +
                 min(CASE WHEN cum >= (nn + 2) // 2 THEN cents END)
                 as bigint) AS med2,
               cast(max(nn) as bigint) AS n
        FROM cum),
      ab AS (
        SELECT p_brand, med2, n,
               cast(sum(CASE WHEN cents * 2 > med2 THEN c ELSE 0 END)
                 as bigint) AS a,
               cast(sum(c) as bigint) AS t
        FROM g CROSS JOIN med
        GROUP BY p_brand, med2, n),
      w AS (
        SELECT *, cast(sum(a) OVER () as bigint) AS ba FROM ab),
      m AS (
        SELECT med2, n, cast(count(*) as int) AS k,
               cast(sum(cast(${rNSql(term, 9)} as decimal(30,9)))
                 as double) AS chi2
        FROM w GROUP BY med2, n)
      SELECT k, n,
             ${r6Sql("cast(med2 as double) / cast(200.0 as double)")}
               AS median_price,
             ${r6Sql("chi2")} AS chi2,
             cast(k - 1 as int) AS df
      FROM m"""
    },
  )

  /** SOMERS' D (and Goodman–Kruskal γ) between order-priority rank and
    * order width (lineitem count) — the DIRECTED ordinal association
    * that q_kendall's symmetric τ-b cannot give: D_yx = (C−D)/(C+D+T_Y)
    * treats priority as the predictor. The fact pair collapses to a
    * ≤5×7-cell CONTINGENCY table (combinable groupBy); concordant /
    * discordant / tie classes come from the C(cells,2) upper-triangle
    * cell pairs (an explicitly tiny broadcast non-equi join — the
    * q_kendall posture) with within-cell both-ties c(c−1)/2 from the
    * diagonal. Every count is an exact int64 product (cell counts ≤
    * 3e7 even at sf100 keep products < 2⁶³); the three ratios are the
    * only doubles. */
  val qSomersD: GQuery = GQuery(
    "q_somers_d",
    (spark, dir) => {
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
        .groupBy($"l_orderkey").agg(count(lit(1)).as("nitems"))
      val cells = Tables.orders(spark, dir)
        .join(li, $"o_orderkey" === $"l_orderkey")
        .select(substring($"o_orderpriority", 1, 1).cast("int").as("x"),
          $"nitems".as("y"))
        .groupBy($"x", $"y").agg(count(lit(1)).as("c"))
      // c(c−1) div 2 in INTEGER space (Spark Column `/` on longs is
      // double division — the div/`//` cross-engine gotcha)
      val diag = cells.agg(sum(expr("c * (c - 1) div 2")).as("t_xy"),
        sum($"c").as("n"))
      val a = cells.select($"x".as("xa"), $"y".as("ya"), $"c".as("ca"))
      val b = cells.select($"x".as("xb"), $"y".as("yb"), $"c".as("cb"))
      val pairs = a.join(broadcast(b),
        $"xa" < $"xb" || ($"xa" === $"xb" && $"ya" < $"yb"))
      val agg = pairs.agg(
        sum(when(($"xb" - $"xa") * ($"yb" - $"ya") > 0, $"ca" * $"cb")
          .otherwise(0L)).as("c"),
        sum(when(($"xb" - $"xa") * ($"yb" - $"ya") < 0, $"ca" * $"cb")
          .otherwise(0L)).as("d"),
        sum(when($"xa" === $"xb", $"ca" * $"cb").otherwise(0L)).as("t_x"),
        sum(when($"ya" === $"yb", $"ca" * $"cb").otherwise(0L)).as("t_y"))
      val j = agg.crossJoin(broadcast(diag))
      val dd = (c: String) => col(c).cast("double")
      j.select($"n", $"c".as("concordant"), $"d".as("discordant"),
        $"t_x", $"t_y", $"t_xy",
        r6((dd("c") - dd("d")) / (dd("c") + dd("d"))).as("gamma"),
        r6((dd("c") - dd("d")) / (dd("c") + dd("d") + dd("t_y")))
          .as("d_yx"),
        r6((dd("c") - dd("d")) / (dd("c") + dd("d") + dd("t_x")))
          .as("d_xy"))
    },
    Some(s"""
      WITH li AS (
        SELECT l_orderkey, count(*) AS nitems
        FROM lineitem GROUP BY l_orderkey),
      cells AS (
        SELECT cast(substr(o_orderpriority, 1, 1) as int) AS x,
               nitems AS y, cast(count(*) as bigint) AS c
        FROM orders JOIN li ON o_orderkey = l_orderkey
        GROUP BY 1, 2),
      diag AS (
        SELECT cast(sum(c * (c - 1) // 2) as bigint) AS t_xy,
               cast(sum(c) as bigint) AS n
        FROM cells),
      p AS (
        SELECT a.x AS xa, a.y AS ya, a.c AS ca,
               b.x AS xb, b.y AS yb, b.c AS cb
        FROM cells a JOIN cells b
          ON a.x < b.x OR (a.x = b.x AND a.y < b.y)),
      agg AS (
        SELECT cast(sum(CASE WHEN (xb - xa) * (yb - ya) > 0
                 THEN ca * cb ELSE 0 END) as bigint) AS c,
               cast(sum(CASE WHEN (xb - xa) * (yb - ya) < 0
                 THEN ca * cb ELSE 0 END) as bigint) AS d,
               cast(sum(CASE WHEN xa = xb THEN ca * cb ELSE 0 END)
                 as bigint) AS t_x,
               cast(sum(CASE WHEN ya = yb THEN ca * cb ELSE 0 END)
                 as bigint) AS t_y
        FROM p)
      SELECT n, c AS concordant, d AS discordant, t_x, t_y, t_xy,
             ${r6Sql("cast(c - d as double) / cast(c + d as double)")}
               AS gamma,
             ${r6Sql("cast(c - d as double) / " +
               "cast(c + d + t_y as double)")} AS d_yx,
             ${r6Sql("cast(c - d as double) / " +
               "cast(c + d + t_x as double)")} AS d_xy
      FROM agg CROSS JOIN diag"""),
  )

  /** CONOVER SQUARED-RANKS test for equality of VARIANCES, click-days vs
    * purchase-days of the daily value series — the rank-based companion
    * to q_levene/q_bartlett that needs no normality and no interpolated
    * medians. Scores are squared MIDRANKS of |x − group mean|; the
    * statistic is the general two-sample linear-rank form
    * z = (T − n₁s̄)/√(n₁n₂/(N(N−1))·Σ(s−s̄)²). Determinism: the raw pass
    * collapses events to per-(type, day) integer cents (combinable; the
    * only scan), so N is calendar-bounded (≤ ~60 rows) and the global
    * rank window is over that tiny aggregate — the SeriesOps posture,
    * not a raw-row sort. Midranks are exact halves, scores exact
    * quarters, so every sum is order-free integer arithmetic in quarter
    * units — no decimal staging needed (the dyadic-rational rule); the
    * group means and the final z are fixed-shape IEEE expressions. */
  val qSquaredRanks: GQuery = GQuery(
    "q_squared_ranks",
    (spark, dir) => {
      import spark.implicits._
      val daily = Tables.events(spark, dir)
        .filter($"event_type".isin("click", "purchase"))
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(sum(floor($"value" * lit(100.0) + lit(0.5)).cast("long"))
          .as("x"))
      val wg = Window.partitionBy($"event_type")
      val u = daily
        .withColumn("mean_g",
          sum($"x").over(wg).cast("double") / count(lit(1)).over(wg)
            .cast("double"))
        .withColumn("u", abs($"x".cast("double") - $"mean_g"))
      val ranked = u
        .withColumn("rk", rank().over(Window.orderBy($"u")))
        .withColumn("ct", count(lit(1)).over(Window.partitionBy($"u")))
        .withColumn("s", {
          val mid = ($"rk".cast("double") * 2 + $"ct".cast("double") -
            lit(1.0)) / lit(2.0)
          mid * mid
        })
      val agg = ranked.agg(
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("n1"),
        sum(when($"event_type" === "click", 0L).otherwise(1L)).as("n2"),
        sum(when($"event_type" === "click", $"s").otherwise(lit(0.0)))
          .as("t"),
        sum($"s").as("ss"),
        sum($"s" * $"s").as("sq"))
      val d = (c: String) => col(c).cast("double")
      val nT = d("n1") + d("n2")
      val sbar = $"ss" / nT
      val varT = d("n1") * d("n2") / (nT * (nT - lit(1.0))) *
        ($"sq" - $"ss" * $"ss" / nT)
      agg.select($"n1", $"n2", $"t".as("t_stat"),
        r6(sbar).as("mean_score"),
        r6(($"t" - d("n1") * sbar) / sqrt(varT)).as("z"))
    },
    Some {
      val nT = "(cast(n1 as double) + cast(n2 as double))"
      val sbar = s"(ss / $nT)"
      val varT = s"(cast(n1 as double) * cast(n2 as double) / " +
        s"($nT * ($nT - cast(1.0 as double))) * (sq - ss * ss / $nT))"
      s"""
      WITH daily AS (
        SELECT event_type, cast(date_trunc('day', ts) as date) AS day,
               cast(sum(cast(floor(value * cast(100.0 as double)
                 + cast(0.5 as double)) as bigint)) as bigint) AS x
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2),
      u AS (
        SELECT event_type,
               abs(cast(x as double) -
                 cast(sum(x) OVER (PARTITION BY event_type) as double) /
                 cast(count(*) OVER (PARTITION BY event_type) as double))
                 AS u
        FROM daily),
      ranked AS (
        SELECT event_type,
               ((cast(rank() OVER (ORDER BY u) as double) *
                 cast(2.0 as double) +
                 cast(count(*) OVER (PARTITION BY u) as double) -
                 cast(1.0 as double)) / cast(2.0 as double)) AS mid
        FROM u),
      a AS (
        SELECT
          cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            as bigint) AS n1,
          cast(sum(CASE WHEN event_type = 'click' THEN 0 ELSE 1 END)
            as bigint) AS n2,
          sum(CASE WHEN event_type = 'click' THEN mid * mid
            ELSE cast(0.0 as double) END) AS t,
          sum(mid * mid) AS ss,
          sum(mid * mid * mid * mid) AS sq
        FROM ranked)
      SELECT n1, n2, t AS t_stat, ${r6Sql(sbar)} AS mean_score,
             ${r6Sql(s"(t - cast(n1 as double) * $sbar) / sqrt($varT)")}
               AS z
      FROM a"""
    },
  )

  /** KENDALL'S W (coefficient of concordance) — do the ship YEARS agree
    * on the revenue RANKING of the 25 part brands? (the m-judges
    * generalization of q_kendall's two-variable τ; the q_friedman
    * statistic's effect-size twin: χ² = m(n−1)W). Judges = complete
    * ship years (years missing any brand are excluded via the modal
    * cell-count window — rankings must be complete for W), objects =
    * brands, score = exact integer revenue cents (no float product:
    * extendedprice cents only, so ranks can never flip on a ulp).
    * Ranks are row_number with brand tiebreak; R_j sums, the deviation
    * sum S = Σ(R_j − m(n+1)/2)², and everything up to the final ratio
    * are exact int64 over the ≤|years|·|brands| cell table. One fact
    * pass; the join to part carries only (partkey → brand). */
  val qKendallW: GQuery = GQuery(
    "q_kendall_w",
    (spark, dir) => {
      import spark.implicits._
      val cells = Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir)
          .select($"p_partkey", $"p_brand"),
          $"l_partkey" === $"p_partkey")
        .groupBy(year($"l_shipdate").as("yr"), $"p_brand")
        .agg(sum(floor($"l_extendedprice" * lit(100.0) + lit(0.5))
          .cast("long")).as("cents"))
      val wAll = Window.partitionBy()
      val wYr = Window.partitionBy($"yr")
      val complete = cells
        .withColumn("n_year", count(lit(1)).over(wYr))
        .withColumn("nb", max($"n_year").over(wAll))
        .filter($"n_year" === $"nb")
      val ranked = complete
        .withColumn("rk", row_number().over(
          Window.partitionBy($"yr").orderBy($"cents".desc, $"p_brand"))
          .cast("long"))
      val rj = ranked.groupBy($"nb", $"p_brand")
        .agg(sum($"rk").as("rsum"), count(lit(1)).as("m"))
      // 2*R_j - m*(n+1) is integer even when m*(n+1) is odd; S4 = 4*S
      val dev = $"rsum" * 2L - $"m" * ($"nb".cast("long") + 1L)
      val s = rj.agg(max($"m").as("m"), max($"nb").cast("long").as("n"),
        sum(dev * dev).as("s4"))
      val mD = $"m".cast("double")
      val nD = $"n".cast("double")
      val w = lit(3.0) * $"s4".cast("double") /
        (mD * mD * (nD * nD * nD - nD))
      s.select($"m".as("n_years"), $"n".cast("int").as("n_brands"),
        $"s4".as("s4"), r6(w).as("kendall_w"),
        r6(mD * (nD - lit(1.0)) * w).as("chi2"))
    },
    Some {
      val w = "(cast(3.0 as double) * cast(s4 as double) / " +
        "(cast(m as double) * cast(m as double) * " +
        "(cast(n as double) * cast(n as double) * cast(n as double) - " +
        "cast(n as double))))"
      s"""
      WITH cells AS (
        SELECT cast(year(l_shipdate) as int) AS yr, p_brand,
               cast(sum(cast(floor(l_extendedprice *
                 cast(100.0 as double) + cast(0.5 as double)) as bigint))
                 as bigint) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2),
      cyr AS (
        SELECT *, count(*) OVER (PARTITION BY yr) AS n_year FROM cells),
      complete AS (
        SELECT * FROM (
          SELECT *, max(n_year) OVER () AS nb FROM cyr) c
        WHERE n_year = nb),
      ranked AS (
        SELECT *, cast(row_number() OVER (PARTITION BY yr
                 ORDER BY cents DESC, p_brand) as bigint) AS rk
        FROM complete),
      rj AS (
        SELECT nb, p_brand, cast(sum(rk) as bigint) AS rsum,
               cast(count(*) as bigint) AS m
        FROM ranked GROUP BY nb, p_brand),
      s AS (
        SELECT cast(max(m) as bigint) AS m, cast(max(nb) as bigint) AS n,
               cast(sum((rsum * 2 - m * (nb + 1)) *
                 (rsum * 2 - m * (nb + 1))) as bigint) AS s4
        FROM rj)
      SELECT m AS n_years, cast(n as int) AS n_brands, s4,
             ${r6Sql(w)} AS kendall_w,
             ${r6Sql(s"cast(m as double) * (cast(n as double) - " +
               s"cast(1.0 as double)) * $w")} AS chi2
      FROM s"""
    },
  )

  val all: Seq[GQuery] =
    Seq(qMannWhitney, qLevene, qKendall, qOddsRatio, qKruskal, qArmitage,
      qWilcoxon, qFriedman, qMcnemar, qDunnTest, qCochranQ, qPageTrend,
      qCliffsDelta, qCvm2, qMoodsMedian, qSomersD, qSquaredRanks,
      qKendallW)
}
