package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Registry

/** Semantic invariants for the round-8 session-4 surface: the
  * experimentation/causal family (CausalOps), the new series and metric
  * diagnostics, and the ANN/dedup audits. These are the checks the
  * oracle hash cannot express — identities that must hold for ANY data,
  * not just the current fixture.
  */
class CausalMetricSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.byName(name).run(spark, sf)

  test("q_cuped variance reduction is a valid share and theta is finite") {
    val rows = run("q_cuped").collect()
    assert(rows.length == 2)
    for (r <- rows) {
      val rho2 = r.getAs[Double]("rho2")
      assert(rho2 >= 0.0 && rho2 <= 1.0, s"rho2=$rho2")
      assert(!r.getAs[Double]("theta").isNaN)
      assert(!r.getAs[Double]("mean_post_adj").isNaN)
    }
  }

  test("q_did cells cover every order and the DiD identity holds") {
    val r = run("q_did").head
    val n = Seq("n00", "n01", "n10", "n11").map(r.getAs[Long]).sum
    val total = graft.engine.Tables.orders(spark, sf).count()
    assert(n == total, s"cells $n != orders $total")
    val did = (r.getAs[Double]("mean_trt_post") -
      r.getAs[Double]("mean_trt_pre")) -
      (r.getAs[Double]("mean_ctl_post") - r.getAs[Double]("mean_ctl_pre"))
    assert(math.abs(did - r.getAs[Double]("did")) < 1e-4,
      s"identity ${did} vs ${r.getAs[Double]("did")}")
  }

  test("q_perm_test p-value is a valid corrected proportion over 200 perms") {
    val r = run("q_perm_test").head
    assert(r.getAs[Long]("n_perms") == 200L)
    val p = r.getAs[Double]("p_value")
    // (1 + n_ge) / 201 with n_ge in [0, 200]
    assert(p >= 1.0 / 201.0 - 1e-9 && p <= 1.0, s"p=$p")
  }

  test("q_srm split covers all users and the flag matches chi2") {
    val r = run("q_srm").head
    val chi2 = r.getAs[Double]("chi2")
    assert(chi2 >= 0.0)
    assert(r.getAs[Boolean]("srm_flag") == (chi2 > 3.841))
  }

  test("q_hurst reports the three chunk sizes with a finite exponent") {
    val rows = run("q_hurst").collect()
    assert(rows.map(_.getAs[Int]("size")).toSeq == Seq(16, 32, 64))
    val h = rows.head.getAs[Double]("hurst")
    assert(!h.isNaN && h > -0.5 && h < 1.5, s"hurst=$h")
  }

  test("q_retention rates are right-censored valid proportions") {
    val rows = run("q_retention").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_retained") <= r.getAs[Long]("n_eligible"))
      val ret = r.getAs[Double]("retention")
      assert(ret >= 0.0 && ret <= 1.0)
    }
  }

  test("q_price_volume effects reconcile to the revenue delta exactly") {
    for (r <- run("q_price_volume").collect()) {
      val lhs = r.getAs[Double]("delta_rev")
      val rhs = r.getAs[Double]("volume_effect") +
        r.getAs[Double]("price_effect")
      assert(math.abs(lhs - rhs) < 1e-3, s"${r.getString(0)}: $lhs vs $rhs")
    }
  }

  test("q_xyz demand shares sum to one across classes") {
    val rows = run("q_xyz").collect()
    val share = rows.map(_.getAs[Double]("demand_share")).sum
    assert(math.abs(share - 1.0) < 1e-4, s"share sum $share")
    for (r <- rows) assert(r.getAs[Double]("avg_cv") >= 0.0)
  }

  test("q_ann_recall is a valid proportion with hits bounded by k") {
    val rows = run("q_ann_recall").collect()
    assert(rows.length == 5)
    for (r <- rows) {
      assert(r.getAs[Long]("n_hits") <= 10L)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_cand"))
      val rec = r.getAs[Double]("recall_at_10")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("q_dedup_sweep is monotone in the threshold") {
    val rows = run("q_dedup_sweep").collect().sortBy(_.getAs[Double]("tau"))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      s"pair counts not monotone: ${pairs.mkString(",")}")
    // planted full copies guarantee the strictest bucket is populated
    assert(pairs.last > 0, "tau=0.9 bucket is empty — planting broken")
  }

  test("q_effect_size magnitudes are ordered |g| <= |d| and finite") {
    val r = run("q_effect_size").head
    val d = r.getAs[Double]("cohens_d")
    val g = r.getAs[Double]("hedges_g")
    assert(!d.isNaN && !g.isNaN)
    // Hedges correction shrinks toward zero
    assert(math.abs(g) <= math.abs(d) + 1e-9, s"|g|=$g |d|=$d")
  }

  test("q_var_backtest violation rate is consistent with its counts") {
    val r = run("q_var_backtest").head
    val n = r.getAs[Long]("n_test"); val x = r.getAs[Long]("x_viol")
    assert(x <= n && n > 0)
    assert(math.abs(r.getAs[Double]("viol_rate") - x.toDouble / n) < 1e-6)
    assert(r.getAs[Double]("lr_pof") >= -1e-9)
  }

  test("q_pr_curve recall is monotone nonincreasing in the threshold") {
    val rows = run("q_pr_curve").collect().sortBy(_.getAs[Double]("tau"))
    val rec = rows.map(_.getAs[Double]("recall"))
    assert(rec.zip(rec.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"recall not monotone: ${rec.mkString(",")}")
  }

  test("q_kruskal H is nonnegative and eps2 is a valid effect share") {
    // Would have caught the round-8 factor-of-n coefficient bug: the
    // oracle shared the same formula, so only an invariant can see it.
    val r = run("q_kruskal").head
    val h = r.getAs[Double]("h")
    val hAdj = r.getAs[Double]("h_adj")
    assert(h >= 0.0, s"h=$h")
    assert(hAdj >= 0.0 && !hAdj.isNaN, s"h_adj=$hAdj")
    val eps2 = r.getAs[Double]("eps2")
    assert(eps2 >= -1e-6 && eps2 <= 1.0, s"eps2=$eps2")
  }

  test("q_armitage z is finite and shares its sign with t_stat") {
    val r = run("q_armitage").head
    val z = r.getAs[Double]("z")
    val t = r.getAs[Double]("t_stat")
    assert(!z.isNaN && !z.isInfinite, s"z=$z")
    assert(z * t >= 0.0, s"sign mismatch z=$z t=$t")
    val p = r.getAs[Double]("base_rate")
    assert(p >= 0.0 && p <= 1.0)
  }

  test("q_ann_ivf_probe recall is monotone in the probe budget") {
    val rows = run("q_ann_ivf_probe").collect()
    assert(rows.length == 10, s"expected 5 probes x 2 budgets, got ${rows.length}")
    val byProbe = rows.groupBy(_.getAs[Long]("p_id"))
    for ((p, rs) <- byProbe) {
      val m = rs.map(r => r.getAs[Int]("n_probe") -> r).toMap
      assert(m(3).getAs[Double]("recall_at_10") >=
        m(1).getAs[Double]("recall_at_10"),
        s"probe $p: recall not monotone in nProbe")
      assert(m(3).getAs[Long]("n_cand") >= m(1).getAs[Long]("n_cand"))
    }
  }

  test("q_pagerank_pers concentrates rank mass on the seed neighborhood") {
    val rows = run("q_pagerank_pers").collect()
    assert(rows.nonEmpty)
    // the top personalized node must be a seed (restart mass dominates
    // on a 5-iteration walk), and some non-seed neighbors must rank
    assert(rows.head.getAs[Boolean]("is_seed"), "top node is not a seed")
    assert(rows.forall(_.getAs[Double]("rank_m") >= 0.0))
  }

  test("q_closeness reaches at least its own component and stays positive") {
    for (r <- run("q_closeness").collect()) {
      assert(r.getAs[Long]("n_reached") > 0)
      assert(r.getAs[Double]("harmonic") > 0.0)
      assert(r.getAs[Long]("sum_dist") >= r.getAs[Long]("n_reached"))
    }
  }
}
