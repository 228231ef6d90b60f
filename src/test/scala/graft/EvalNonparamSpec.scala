package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Registry

/** Semantic invariants for the round-8 session-3 surface: classifier
  * evaluation (EvalOps), nonparametric tests (NonparamOps), and link
  * prediction / interval union (LinkOps). Each test pins a mathematical
  * identity the oracle hash-match alone would not localize.
  */
class EvalNonparamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.byName(name).run(spark, sf)

  test("q_roc_auc is a probability and gini is its affine twin") {
    val r = run("q_roc_auc").head
    val auc = r.getAs[Double]("auc")
    assert(r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_neg") > 0)
    assert(auc >= 0.0 && auc <= 1.0, s"auc=$auc")
    assert(math.abs(r.getAs[Double]("gini_coef") - (2 * auc - 1)) < 2e-6)
  }

  test("q_kappa: po/pe are probabilities and kappa matches their ratio") {
    val r = run("q_kappa").head
    val po = r.getAs[Double]("po"); val pe = r.getAs[Double]("pe")
    val k = r.getAs[Double]("kappa")
    assert(po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-4, s"k=$k po=$po pe=$pe")
  }

  test("q_mcc cells tile the corpus and accuracy matches the diagonal") {
    val r = run("q_mcc").head
    val tp = r.getAs[Long]("tp"); val fp = r.getAs[Long]("fp")
    val fn = r.getAs[Long]("fn"); val tn = r.getAs[Long]("tn")
    val n = graft.engine.Tables.documents(spark, sf).count()
    assert(tp + fp + fn + tn === n)
    assert(math.abs(r.getAs[Double]("accuracy") -
      (tp + tn).toDouble / n) < 2e-6)
    val m = r.getAs[Double]("mcc")
    assert(m >= -1.0 - 1e-9 && m <= 1.0 + 1e-9)
  }

  test("q_ece rows are self-consistent and ece is their weighted gap") {
    val rows = run("q_ece").collect()
    assert(rows.nonEmpty)
    var wsum = 0.0; var nsum = 0L
    rows.foreach { r =>
      val acc = r.getAs[Double]("acc"); val conf = r.getAs[Double]("conf")
      val gap = r.getAs[Double]("gap"); val nb = r.getAs[Long]("n")
      assert(acc >= 0 && acc <= 1 && conf >= 0)
      assert(math.abs(gap - math.abs(acc - conf)) < 2e-6)
      wsum += nb * gap; nsum += nb
    }
    val ece = rows.head.getAs[Double]("ece")
    assert(rows.forall(_.getAs[Double]("ece") == ece), "ece must be global")
    assert(math.abs(ece - wsum / nsum) < 2e-6)
  }

  test("q_mannwhitney: U is within range and CLES is its normalization") {
    val r = run("q_mannwhitney").head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val u1 = r.getAs[Double]("u1")
    assert(u1 >= 0 && u1 <= n1.toDouble * n2)
    assert(math.abs(r.getAs[Double]("cles") - u1 / (n1.toDouble * n2)) < 2e-6)
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("q_levene: both sums of squares are nonnegative, F finite") {
    val r = run("q_levene").head
    assert(r.getAs[Int]("k") >= 2)
    assert(r.getAs[Double]("ss_between") >= 0)
    assert(r.getAs[Double]("ss_within") > 0)
    assert(r.getAs[Double]("f_bf") >= 0)
  }

  test("q_kendall: tau-b bounded, pair counts tile C(n,2)") {
    val r = run("q_kendall").head
    val n0 = r.getAs[Long]("n0")
    val c = r.getAs[Long]("concordant"); val d = r.getAs[Long]("discordant")
    assert(c + d <= n0)
    val t = r.getAs[Double]("tau_b")
    assert(t >= -1.0 - 1e-9 && t <= 1.0 + 1e-9)
  }

  test("q_oddsratio: CI brackets the point estimate") {
    val r = run("q_oddsratio").head
    val or = r.getAs[Double]("odds_ratio")
    assert(or > 0)
    assert(r.getAs[Double]("ci_lo") <= or && or <= r.getAs[Double]("ci_hi"))
    val total = r.getAs[Long]("a") + r.getAs[Long]("b") +
      r.getAs[Long]("c") + r.getAs[Long]("d")
    assert(total === graft.engine.Tables.events(spark, sf).count())
  }

  test("q_adamic_adar predicts only non-edges with positive scores") {
    val rows = run("q_adamic_adar").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("u") < r.getAs[Long]("w"))
      assert(r.getAs[Long]("n_common") >= 1)
      assert(r.getAs[Double]("aa_score") > 0)
    }
    // scores are sorted descending with the declared tiebreak
    val scores = rows.map(_.getAs[Double]("aa_score")).toSeq
    assert(scores == scores.sortBy(-_))
  }

  test("q_degree_dist histogram is positive with one global slope") {
    val rows = run("q_degree_dist").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_vertices") > 0))
    val slopes = rows.map(_.getAs[Double]("loglog_slope")).distinct
    assert(slopes.size == 1 && !slopes.head.isNaN)
  }

  test("q_interval_union: coverage is positive and bounded by the span") {
    val rows = run("q_interval_union").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cov = r.getAs[Long]("covered_s"); val span = r.getAs[Long]("span_s")
      assert(cov >= 1 && cov <= span,
        s"user=${r.getAs[Long]("user_id")} covered=$cov span=$span")
      assert(r.getAs[Double]("utilization") <= 1.0 + 1e-9)
    }
  }

  test("q_holt: forecast is the linear extrapolation of (level, trend)") {
    val r = run("q_holt").head
    assert(r.getAs[Int]("n_days") > 10)
    val l = r.getAs[Double]("level"); val b = r.getAs[Double]("trend")
    assert(math.abs(r.getAs[Double]("forecast_7d") - (l + 7 * b)) < 1e-5)
  }

  test("q_elasticity covers every brand with a finite fit") {
    val rows = run("q_elasticity").collect()
    assert(rows.length >= 20, s"brands=${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      val e = r.getAs[Any]("elasticity")
      if (e != null) assert(!e.asInstanceOf[Double].isNaN)
    }
  }

  test("q_path_ngrams supports are a sub-distribution over trigrams") {
    val rows = run("q_path_ngrams").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Double]("support")).sum
    assert(total > 0 && total <= 1.0 + 1e-6, s"sum=$total")
    rows.foreach(r => assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n")))
  }

  test("q_media_dedup finds the planted replicas as dup groups") {
    val rows = run("q_media_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_copies") >= 2)
      assert(r.getAs[Long]("total_bytes") >= r.getAs[Long]("n_copies"))
    }
    // planted groups keep the original (< 50) id as keeper
    assert(rows.exists(_.getAs[Long]("keeper") < 50))
  }

  test("q_bootstrap: CI brackets are ordered and consistent with the SE") {
    val r = run("q_bootstrap").head
    val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
    val se = r.getAs[Double]("boot_se"); val m = r.getAs[Double]("mean_raw")
    assert(r.getAs[Long]("b_reps") === 50L)
    assert(lo < hi && se > 0)
    // the raw mean sits inside a generous multiple of the bootstrap SE
    assert(math.abs(m - (lo + hi) / 2) < 10 * se,
      s"mean=$m ci=($lo,$hi) se=$se")
  }

  test("q_pacf emits one bounded coefficient per lag") {
    val rows = run("q_pacf").collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq == Seq(1, 2, 3))
    rows.foreach { r =>
      val p = r.getAs[Double]("pacf")
      assert(p >= -1.0 - 1e-9 && p <= 1.0 + 1e-9, s"pacf=$p")
    }
  }

  test("q_drawdown is a valid peak-relative dip") {
    val r = run("q_drawdown").head
    val dd = r.getAs[Double]("max_drawdown")
    assert(dd >= 0 && dd < 1)
    assert(r.getAs[Double]("trough_revenue") <=
      r.getAs[Double]("peak_revenue") + 1e-9)
  }

  test("q_growth_acct reconciles DAU day over day") {
    import org.apache.spark.sql.functions._
    val rows = run("q_growth_acct").collect()
    assert(rows.nonEmpty)
    val actives = graft.engine.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("day").toString
      val dau = actives.getOrElse(d, 0L)
      // every active user is exactly one of new/retained/resurrected
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") +
        r.getAs[Long]("n_resurrected") === dau, s"day=$d")
      assert(r.getAs[Long]("net_change") ===
        r.getAs[Long]("n_new") + r.getAs[Long]("n_resurrected") -
          r.getAs[Long]("n_churned"))
    }
    // yesterday's actives either retain or churn
    val byDay = rows.map(r =>
      r.getAs[java.sql.Date]("day").toString -> r).toMap
    rows.foreach { r =>
      val d = java.time.LocalDate.parse(
        r.getAs[java.sql.Date]("day").toString)
      actives.get(d.minusDays(1).toString).foreach { yesterday =>
        assert(r.getAs[Long]("n_retained") + r.getAs[Long]("n_churned")
          === yesterday, s"day=$d retained+churned != DAU(d-1)")
      }
    }
    assert(byDay.nonEmpty)
  }

  test("q_join_asof_near picks the closer of the two asof directions") {
    val near = run("q_join_asof_near").collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.sql.Timestamp]("nearest_signup_ts"))).toMap
    val prior = run("q_join_asof").collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.sql.Timestamp]("asof_signup_ts"))).toMap
    assert(near.keySet == prior.keySet, "same purchase set as backward asof")
    prior.foreach { case (id, p) =>
      // when a prior signup exists, nearest is never null and never
      // farther than the prior candidate
      p.foreach { _ => assert(near(id).isDefined, s"event $id") }
    }
    assert(near.values.exists(_.isDefined))
  }

  test("q_compaction bins tile the partitioned lake exactly") {
    val rows = run("q_compaction").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total === graft.engine.Tables.orders(spark, sf).count(),
      "bin rows must tile the table")
    assert(rows.map(_.getAs[Long]("bin")).distinct.length == rows.length)
    rows.foreach(r => assert(r.getAs[Long]("n_files") >= 1))
  }

  test("q_changepoint_keyed: one split per key with consistent means") {
    val rows = run("q_changepoint_keyed").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("event_type")).distinct.length ==
      rows.length)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_before") >= 0)
      assert(r.getAs[Double]("mean_after") >= 0)
      assert(r.getAs[Double]("max_cusum") >= 0)
    }
  }

  test("q_season_strength: strengths are in [0,1] for every type") {
    val rows = run("q_season_strength").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val st = r.getAs[Double]("strength_trend")
      val ss = r.getAs[Double]("strength_seasonal")
      assert(st >= 0 && st <= 1, s"trend=$st")
      assert(ss >= 0 && ss <= 1, s"seasonal=$ss")
      assert(r.getAs[Long]("n_days") > 0)
    }
  }

  test("q_cohort_ltv: LTV is cumulative and normalizations agree") {
    val rows = run("q_cohort_ltv").collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getAs[Int]("cohort_year"),
        r.getAs[Int]("cohort_month"))).foreach { case (_, g) =>
      val byAge = g.sortBy(_.getAs[Int]("age_months"))
      val revs = byAge.map(_.getAs[Double]("cum_revenue"))
      assert(revs.zip(revs.tail).forall { case (a, b) => a <= b + 1e-6 },
        "cumulative revenue must be monotone in age")
      byAge.foreach { r =>
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"))
        assert(math.abs(r.getAs[Double]("ltv_per_user") -
          r.getAs[Double]("cum_revenue") / r.getAs[Long]("n_cohort"))
          < 0.02)
      }
    }
  }

  test("q_poisson_fit: expected masses nearly tile N, chi2 global") {
    val rows = run("q_poisson_fit").collect()
    assert(rows.nonEmpty)
    val obsTotal = rows.map(_.getAs[Long]("obs")).sum
    val expTotal = rows.map(_.getAs[Double]("expected")).sum
    // the histogram support covers almost all Poisson mass
    assert(expTotal > 0.8 * obsTotal && expTotal < 1.05 * obsTotal,
      s"expected=$expTotal obs=$obsTotal")
    val chi2 = rows.head.getAs[Double]("chi2")
    assert(chi2 >= 0 && rows.forall(_.getAs[Double]("chi2") == chi2))
  }

  test("q_capture_recapture: estimate dominates the observed union") {
    val r = run("q_capture_recapture").head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val m = r.getAs[Long]("m"); val obs = r.getAs[Long]("n_observed")
    assert(m <= math.min(n1, n2))
    assert(obs === n1 + n2 - m, "observed = union of the two samples")
    assert(r.getAs[Double]("n_est") >= obs - 1e-6,
      "Chapman estimate can't undercut what was directly seen")
    val cov = r.getAs[Double]("coverage")
    assert(cov > 0 && cov <= 1.0 + 1e-6)
  }

  test("q_weibull_fit recovers a positive shape and scale") {
    val r = run("q_weibull_fit").head
    assert(r.getAs[Long]("n_points") >= 3)
    assert(r.getAs[Double]("shape") > 0)
    assert(r.getAs[Double]("scale_days") > 0)
  }

  test("q_fold_balance: folds tile the corpus with sane balance stats") {
    val rows = run("q_fold_balance").collect()
    assert(rows.length == 5)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === graft.engine.Tables.documents(spark, sf).count())
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4)
    val chi2 = rows.head.getAs[Double]("chi2_uniform")
    assert(chi2 >= 0 && rows.forall(_.getAs[Double]("chi2_uniform") == chi2))
    rows.foreach(r => assert(r.getAs[Double]("lang_entropy") >= -1e-9))
  }

  test("q_rejection_sample moves every language toward the 0.2 target") {
    val rows = run("q_rejection_sample").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("accept_rate")).max >= 1.0 - 1e-6,
      "the largest-deficit language keeps everything")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_after") <= r.getAs[Long]("n_before"))
      val rate = r.getAs[Double]("accept_rate")
      assert(rate > 0 && rate <= 1.0 + 1e-6)
    }
    val shares = rows.map(_.getAs[Double]("share_after")).sum
    assert(math.abs(shares - 1.0) < 1e-4)
  }

  test("q_price_index: Fisher is the geometric mean of L and P") {
    val rows = run("q_price_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getAs[Double]("laspeyres"); val p = r.getAs[Double]("paasche")
      val f = r.getAs[Double]("fisher")
      assert(l > 0 && p > 0)
      assert(math.abs(f - math.sqrt(l * p)) < 1e-4, s"f=$f l=$l p=$p")
      assert(r.getAs[Long]("n_parts") > 0)
    }
  }

  test("q_groupby_all matches the explicit grouping through spark.sql") {
    import org.apache.spark.sql.functions._
    val got = run("q_groupby_all").collect()
    val want = graft.engine.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_items"))
      .toMap
    assert(got.length == want.size)
    got.foreach { r =>
      assert(r.getAs[Long]("n_items") ===
        want((r.getString(0), r.getString(1))))
    }
  }

  test("q_lorenz: cumulative shares are monotone, convex, end at 1") {
    val rows = run("q_lorenz").collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 10)
    val cum = rows.map(_.getAs[Double]("cum_share"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(cum.last - 1.0) < 1e-4)
    // Lorenz curve lies under the diagonal (inequality exists)
    assert(cum.head <= 0.1 + 1e-6)
  }

  test("q_peaks: every peak clears its trailing mean by the threshold") {
    val rows = run("q_peaks").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("prominence") > 1.25)
      assert(r.getAs[Double]("revenue") > 0)
    }
    val prom = rows.map(_.getAs[Double]("prominence")).toSeq
    assert(prom == prom.sortBy(-_))
  }

  test("q_ndcg: idcg dominates dcg and ndcg is their guarded ratio") {
    val rows = run("q_ndcg").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val nRel = r.getAs[Int]("n_rel")
      val dcg = r.getAs[Double]("dcg"); val idcg = r.getAs[Double]("idcg")
      assert(nRel >= 0 && nRel <= 10)
      assert(idcg >= dcg - 2e-6, s"idcg=$idcg dcg=$dcg")
      if (nRel > 0) {
        val ndcg = r.getAs[Double]("ndcg")
        assert(ndcg >= 0 && ndcg <= 1 + 2e-6)
        assert(math.abs(ndcg - dcg / idcg) < 2e-6)
      } else assert(r.isNullAt(r.fieldIndex("ndcg")))
    }
  }

  test("q_mrr: rr inverts the first relevant rank; mrr is their mean") {
    val rows = run("q_mrr").collect()
    assert(rows.length === 10)
    var s = 0.0
    rows.foreach { r =>
      val rr = r.getAs[Double]("rr")
      if (r.isNullAt(r.fieldIndex("first_rel_rank"))) assert(rr === 0.0)
      else {
        val fr = r.getAs[Int]("first_rel_rank")
        assert(fr >= 1 && fr <= 10)
        assert(math.abs(rr - 1.0 / fr) < 2e-6)
      }
      s += rr
    }
    val mrr = rows.head.getAs[Double]("mrr")
    assert(rows.forall(_.getAs[Double]("mrr") == mrr), "mrr must be global")
    assert(math.abs(mrr - s / rows.length) < 2e-6)
  }

  test("q_gains: capture is monotone to 1 and the full-corpus lift is 1") {
    val rows = run("q_gains").collect()
    assert(rows.nonEmpty)
    val caps = rows.map(_.getAs[Double]("capture")).toSeq
    assert(caps == caps.sorted, "capture must be nondecreasing down-score")
    assert(math.abs(caps.last - 1.0) < 2e-6)
    assert(math.abs(rows.last.getAs[Double]("lift") - 1.0) < 2e-6)
    assert(rows.map(_.getAs[Long]("n")).sum ===
      rows.last.getAs[Long]("cum_n"))
  }

  test("q_brier satisfies the Murphy decomposition within rounding") {
    val r = run("q_brier").head
    val brier = r.getAs[Double]("brier")
    val unc = r.getAs[Double]("uncertainty")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    assert(brier >= 0 && brier <= 1)
    assert(unc >= 0 && unc <= 0.25 + 1e-9)
    assert(rel >= 0 && res >= 0)
    // decomposition is exact only for in-bin-constant forecasts; with
    // 0.05-wide bins the within-bin variance term bounds the residual
    assert(math.abs(brier - (unc - res + rel)) < 0.01,
      s"brier=$brier unc=$unc rel=$rel res=$res")
  }

  test("new queries never degrade to a cartesian product") {
    for (q <- Seq("q_roc_auc", "q_kappa", "q_mcc", "q_ece", "q_mannwhitney",
        "q_levene", "q_oddsratio", "q_adamic_adar", "q_degree_dist",
        "q_interval_union")) {
      val p = run(q).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), q)
    }
  }
}
