package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the round-10 declared queries — properties the
  * shared-formula DuckDB oracle cannot see (it would reproduce a wrong
  * formula bit-for-bit): metric ranges, planted-row guarantees,
  * accounting identities, and cross-query consistency.
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def rows(q: String): Array[Row] =
    SparkEntry.queries(q)(spark, sf).collect()

  test("q_neardup_embed finds every planted duplicate pair at cos 1.0") {
    val r = rows("q_neardup_embed")
    val planted = r.filter(x =>
      x.getLong(1) == x.getLong(0) + 1000000L)
    assert(planted.length == 25, s"expected 25 planted pairs, got ${planted.length}")
    planted.foreach(x => assert(x.getDouble(2) == 1.0,
      s"planted pair ${x.getLong(0)} cos ${x.getDouble(2)}"))
    r.foreach(x => assert(x.getDouble(2) >= 0.95))
  }

  test("q_map_at_k: AP in [0,1], MAP is the mean of null-as-zero APs") {
    val r = rows("q_map_at_k")
    assert(r.length == 5)
    val aps = r.map(x => if (x.isNullAt(2)) 0.0 else x.getDouble(2))
    aps.foreach(a => assert(a >= 0.0 && a <= 1.0))
    val map = r.head.getDouble(3)
    assert(r.forall(_.getDouble(3) == map), "MAP must be constant")
    assert(math.abs(map - aps.sum / aps.length) < 2e-6,
      s"MAP $map vs mean ${aps.sum / aps.length}")
  }

  test("q_dunn_test: 10 pairs, rank-sum identity, z antisymmetric in sign") {
    val r = rows("q_dunn_test")
    assert(r.length == 10, s"C(5,2) pairs expected, got ${r.length}")
    r.foreach { x =>
      val (na, nb) = (x.getLong(2), x.getLong(3))
      val (ma, mb, z) = (x.getDouble(4), x.getDouble(5), x.getDouble(6))
      assert(ma >= 1.0 && mb >= 1.0, "mean ranks start at 1")
      // z sign must match the mean-rank difference
      assert((ma - mb) * z >= 0.0, s"sign mismatch: $ma $mb $z")
      assert(na > 0 && nb > 0)
    }
  }

  test("q_rrf: fused list comes only from the two legs, scores bounded") {
    val r = rows("q_rrf")
    r.foreach { x =>
      val vr = if (x.isNullAt(2)) None else Some(x.getInt(2))
      val tr = if (x.isNullAt(3)) None else Some(x.getInt(3))
      assert(vr.nonEmpty || tr.nonEmpty, "fused row in neither leg")
      val score = x.getDouble(4)
      val want = vr.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
        tr.map(t => 1.0 / (60 + t)).getOrElse(0.0)
      assert(math.abs(score - want) < 2e-6, s"score $score vs $want")
      assert(score <= 2.0 / 61 + 1e-9 && score >= 1.0 / 70 - 1e-9)
    }
    // per probe: exactly 10 fused rows, ranks 1..10
    r.groupBy(_.getLong(0)).foreach { case (p, g) =>
      assert(g.map(_.getInt(5)).sorted.toSeq == (1 to 10), s"probe $p ranks")
    }
  }

  test("q_cochran_q: totals reconcile and Q is non-negative") {
    val Array(r) = rows("q_cochran_q")
    val t = r.getLong(1)
    assert(t == r.getLong(2) + r.getLong(3) + r.getLong(4),
      "grand total = sum of column totals")
    assert(r.getDouble(5) >= 0.0, s"Q ${r.getDouble(5)}")
    assert(t >= r.getLong(0), "every block has >= 1 mark")
    assert(t <= 3 * r.getLong(0), "at most k marks per block")
  }

  test("q_page_trend: L within its algebraic bounds, k = 5 complete blocks") {
    val Array(r) = rows("q_page_trend")
    val (n, k, l) = (r.getLong(0), r.getInt(1), r.getDouble(2))
    assert(k == 5)
    // per block, L contribution lies between sum_j w_j (k+1-j) and
    // sum_j w_j j  (anti-sorted vs sorted ranks): 35..55 for k=5
    assert(l >= 35.0 * n && l <= 55.0 * n, s"L=$l n=$n")
  }

  test("q_cvm_exp: W2 positive and bounded by n/3 identity range") {
    val Array(r) = rows("q_cvm_exp")
    assert(r.getDouble(1) > 0.0, "lambda_hat")
    val w2 = r.getDouble(2)
    assert(w2 > 0.0 && w2 < r.getLong(0) / 3.0, s"W2 $w2")
  }

  test("q_iv_2sls: strong instrument recovers OLS, weak one is flagged") {
    val r = rows("q_iv_2sls").map(x => x.getString(0) ->
      (x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    val (olsS, ivS, rS) = r("price_band")
    assert(rS > 0.99, s"price band first stage $rS")
    assert(math.abs(ivS - olsS) < 0.01, s"strong IV $ivS vs OLS $olsS")
    val (_, _, rW) = r("quantity")
    assert(math.abs(rW) < 0.05, s"quantity first stage $rW should be ~0")
  }

  test("q_rfm_migration: matrix covers both-half customers exactly once") {
    val r = rows("q_rfm_migration")
    r.foreach { x =>
      assert(x.getInt(0) >= 1 && x.getInt(0) <= 4)
      assert(x.getInt(1) >= 1 && x.getInt(1) <= 4)
      assert(x.getDouble(3) > 0.0 && x.getDouble(3) <= 1.0)
    }
    // row shares sum to ~1 within each origin segment
    r.groupBy(_.getInt(0)).foreach { case (seg, g) =>
      val s = g.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"seg $seg row shares sum $s")
    }
  }

  test("q_boilerplate flags all 25 planted docs and the footer's origin") {
    val r = rows("q_boilerplate")
    val ids = r.map(_.getLong(0)).toSet
    (0 until 25).foreach(i => assert(ids.contains(500000L + i),
      s"planted doc ${500000 + i} not flagged"))
    assert(ids.contains(0L), "doc 0 (footer origin) must be flagged")
    r.foreach { x =>
      assert(x.getInt(2) >= 1 && x.getInt(2) <= x.getInt(1))
      val frac = x.getDouble(3)
      assert(frac > 0.0 && frac <= 1.0)
    }
  }

  test("q_group_seq: cumulative counts are monotone; crossings match z") {
    val r = rows("q_group_seq")
    assert(r.length > 1)
    val n0 = r.map(_.getLong(1)); val n1 = r.map(_.getLong(2))
    assert(n0.zip(n0.tail).forall { case (a, b) => b >= a }, "n0 monotone")
    assert(n1.zip(n1.tail).forall { case (a, b) => b >= a }, "n1 monotone")
    r.filter(x => !x.isNullAt(3)).foreach { x =>
      assert(x.getBoolean(4) == (math.abs(x.getDouble(3)) > 2.413))
    }
  }

  test("q_seasonal_mk variance is below the unseasonal q_mk_trend bound") {
    val Array(r) = rows("q_seasonal_mk")
    assert(r.getInt(0) == 12, "12 seasons")
    assert(r.getDouble(2) > 0.0)
    // |S| can never exceed the total number of within-season pairs
    // (12 seasons x C(years,2); years < 10 in every fixture)
    assert(math.abs(r.getLong(1)) <= 12L * 45, "S bounded by pair count")
  }

  test("q_partial_corr: controlling the only confounder tightens the correlation") {
    val Array(r) = rows("q_partial_corr")
    val (rxy, pc) = (r.getDouble(1), r.getDouble(4))
    assert(rxy > 0.9 && pc >= rxy - 1e-9, s"partial $pc vs raw $rxy")
    assert(pc <= 1.0)
  }

  test("q_oaxaca: components reproduce the mean gap") {
    val Array(r) = rows("q_oaxaca")
    val gap = r.getDouble(2)
    val sum = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
    assert(math.abs(gap - sum) < 5e-6, s"gap $gap vs E+C+I $sum")
  }

  test("q_embed_outlier always flags the planted anti-centroid at cos -1") {
    val r = rows("q_embed_outlier")
    val planted = r.find(_.getLong(0) == 2000000L)
    assert(planted.nonEmpty, "planted anti-centroid missing")
    assert(planted.get.getDouble(1) == -1.0)
    assert(planted.get.getDouble(2) < -3.0)
    r.foreach(x => assert(x.getDouble(2) < -3.0))
  }

  test("q_cliffs_delta reconciles with q_mannwhitney (delta = 2U/nm - 1)") {
    val Array(cd) = rows("q_cliffs_delta")
    val (n1, n2) = (cd.getLong(0), cd.getLong(1))
    val (gt, lt) = (cd.getLong(2), cd.getLong(3))
    assert(gt + lt <= n1 * n2, "dominance counts bounded by pair count")
    val Array(mw) = rows("q_mannwhitney")
    // U1 counts x>y pairs with ties at half weight: U1 = gt + ties/2
    val u1 = mw.getDouble(2)
    val ties = n1 * n2 - gt - lt
    assert(math.abs(u1 - (gt + ties / 2.0)) < 1e-6,
      s"U1 $u1 vs gt+ties/2 ${gt + ties / 2.0}")
    val delta = cd.getDouble(4)
    assert(math.abs(delta - (gt - lt).toDouble / (n1 * n2)) < 2e-6)
  }

  test("q_cvm2: T positive and bounded; agrees in scale with the KS gap") {
    val Array(r) = rows("q_cvm2")
    val t = r.getDouble(2)
    // T in [0, (n+m)/12-ish]; for near-identical samples it sits near
    // its null mean (1/6 + 1/(6(n+m))) — assert the loose range
    assert(t > 0.0 && t < (r.getLong(0) + r.getLong(1)) / 4.0, s"T=$t")
  }

  test("q_neyman_alloc: integer seats sum exactly to the 1000 budget") {
    val r = rows("q_neyman_alloc")
    assert(r.length == 5)
    assert(r.map(_.getInt(3).toLong).sum == 1000L)
    r.foreach { x =>
      assert(x.getInt(3) > 0, s"${x.getString(0)} got zero seats")
      assert(x.getDouble(2) > 0.0)
    }
  }

  test("q_hard_negatives: winners respect the label constraint") {
    import org.apache.spark.sql.functions.col
    val labels = graft.engine.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r = rows("q_hard_negatives")
    assert(r.nonEmpty)
    r.foreach { x =>
      val p = labels(x.getLong(0))
      if (!x.isNullAt(1))
        assert(labels(x.getLong(1)) == p, s"positive label mismatch: $x")
      if (!x.isNullAt(3))
        assert(labels(x.getLong(3)) != p, s"negative label match: $x")
      if (!x.isNullAt(2)) assert(math.abs(x.getDouble(2)) <= 1.0 + 1e-9)
      if (!x.isNullAt(4)) assert(math.abs(x.getDouble(4)) <= 1.0 + 1e-9)
    }
  }

  test("q_embed_dimstats: 64 dims, non-negative variance, shares sum to 1") {
    val r = rows("q_embed_dimstats")
    assert(r.length == 64)
    r.foreach(x => assert(x.getDouble(3) >= 0.0))
    val s = r.map(_.getDouble(4)).sum
    assert(math.abs(s - 1.0) < 1e-4, s"var shares sum $s")
  }

  test("q_psm_att: every treated user matches when controls exist") {
    val Array(r) = rows("q_psm_att")
    val (nt, nc, nm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nc > 0 && nm == nt, s"matched $nm of $nt treated")
    assert(!r.getDouble(3).isNaN && !r.getDouble(4).isNaN)
  }

  test("q_holt_winters: seasonal fold matches a reference Scala fold bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val xs = graft.engine.Tables.orders(spark, sf)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .orderBy($"day").select($"x").as[Double].collect()
    var l = xs.take(7).sum / 7.0
    var b = 0.0
    val se = xs.take(7).map(_ - l)
    var k = 0
    xs.drop(7).foreach { x =>
      val sOld = se(k % 7)
      val lNew = 0.5 * (x - sOld) + 0.5 * (l + b)
      val bNew = 0.3 * (lNew - l) + 0.7 * b
      se(k % 7) = 0.4 * (x - lNew) + 0.6 * sOld
      l = lNew; b = bNew; k += 1
    }
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    val Array(row) = rows("q_holt_winters")
    assert(row.getDouble(1) == r6(l), s"level ${row.getDouble(1)} vs ${r6(l)}")
    assert(row.getDouble(2) == r6(b), s"trend ${row.getDouble(2)} vs ${r6(b)}")
    assert(row.getDouble(3) == r6(l + b + se(k % 7)),
      s"forecast ${row.getDouble(3)} vs ${r6(l + b + se(k % 7))}")
  }

  test("q_jarque_bera: 3 flags, JB >= 0 and reconciles with S/K columns") {
    val r = rows("q_jarque_bera")
    assert(r.length == 3)
    r.foreach { x =>
      val (n, s, k, jb) =
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))
      assert(jb >= 0.0 && k > 0.0, s"jb=$jb k=$k")
      val expect = n / 6.0 * (s * s + (k - 3.0) * (k - 3.0) / 4.0)
      // columns are 6-dp rounded AFTER jb was computed — loose band
      assert(math.abs(jb - expect) < 0.05 + 1e-4 * n, s"jb=$jb vs $expect")
    }
  }

  test("q_bartlett: statistic and pooled variance are non-negative") {
    val Array(r) = rows("q_bartlett")
    assert(r.getInt(0) == 3)
    assert(r.getDouble(2) > 0.0, "pooled variance")
    // (N-k)ln(sp2) >= sum (ni-1)ln(si2) by concavity of ln
    assert(r.getDouble(3) >= -1e-6, s"T=${r.getDouble(3)}")
  }

  test("q_welch_anova: F* >= 0 and df2 within (0, N-k]") {
    val Array(r) = rows("q_welch_anova")
    val (k, n) = (r.getInt(0), r.getLong(1))
    assert(k == 5)
    assert(r.getDouble(2) >= 0.0)
    val df2 = r.getDouble(3)
    assert(df2 > 0.0 && df2 <= (n - k).toDouble, s"df2=$df2")
  }

  test("q_moods_median: chi2 >= 0, df = k-1, median inside the price band") {
    val Array(r) = rows("q_moods_median")
    val (k, med, chi2, df) =
      (r.getInt(0), r.getDouble(2), r.getDouble(3), r.getInt(4))
    assert(df == k - 1)
    assert(chi2 >= 0.0)
    assert(med >= 900.0 && med <= 1000.0, s"median $med")
  }

  test("q_variance_ratio: q in {2,5}, VR > 0, z sign follows VR-1") {
    val r = rows("q_variance_ratio")
    assert(r.map(_.getInt(0)).toSeq == Seq(2, 5))
    r.foreach { x =>
      val (vr, z) = (x.getDouble(2), x.getDouble(3))
      assert(vr > 0.0)
      assert((vr - 1.0) * z >= 0.0, s"vr=$vr z=$z")
      assert(x.getLong(1) == 29L, "30-day calendar gives 29 increments")
    }
  }

  test("q_pettitt: K bounded by the exact U-statistic maximum, p > 0") {
    val Array(r) = rows("q_pettitt")
    val (n, k) = (r.getLong(0), r.getLong(1))
    // |U_t| = |2*sum(r_i) - t(N+1)| is maximized below t(N+1) <= N(N+1)
    assert(k >= 0 && k <= n * (n + 1), s"K=$k")
    assert(r.getDouble(3) > 0.0, "approximate p must be positive")
  }

  test("q_adf: 29 pairs; t-ratio carries the slope's sign") {
    val Array(r) = rows("q_adf")
    assert(r.getLong(0) == 29L)
    val (rho, t) = (r.getDouble(1), r.getDouble(2))
    assert(rho * t >= 0.0, s"rho=$rho t=$t")
  }

  test("q_somers_d: pair classes partition C(n,2) exactly") {
    val Array(r) = rows("q_somers_d")
    val n = r.getLong(0)
    val total = r.getLong(1) + r.getLong(2) + r.getLong(3) +
      r.getLong(4) + r.getLong(5)
    assert(total == n * (n - 1) / 2, s"partition $total vs C($n,2)")
    val (gamma, dyx, dxy) =
      (r.getDouble(6), r.getDouble(7), r.getDouble(8))
    // denominators only grow: |gamma| >= |D_yx|, |D_xy|; same sign
    assert(math.abs(gamma) >= math.abs(dyx) - 1e-9)
    assert(math.abs(gamma) >= math.abs(dxy) - 1e-9)
    assert(gamma * dyx >= 0.0 && gamma * dxy >= 0.0)
  }

  test("q_bh_fdr: rejections form a rank prefix; q >= p and q is monotone") {
    val r = rows("q_bh_fdr").sortBy(_.getInt(1))
    assert(r.length == 25)
    val rejected = r.map(_.getInt(8))
    val firstKeep = rejected.indexOf(0)
    if (firstKeep >= 0)
      assert(rejected.drop(firstKeep).forall(_ == 0), "prefix property")
    var prevQ = 0.0
    r.foreach { x =>
      val (p, q) = (x.getDouble(6), x.getDouble(7))
      assert(p >= 0.0 && p <= 1.0 && q >= p - 1e-9, s"p=$p q=$q")
      assert(q >= prevQ - 1e-9, "q-values nondecreasing in rank")
      prevQ = q
    }
  }

  test("q_auc_delong: AUC matches q_roc_auc; CI brackets it") {
    val Array(dl) = rows("q_auc_delong")
    val Array(roc) = rows("q_roc_auc")
    assert(dl.getDouble(2) == roc.getDouble(2),
      s"AUC ${dl.getDouble(2)} vs roc ${roc.getDouble(2)}")
    val (auc, se, lo, hi) = (dl.getDouble(2), dl.getDouble(3),
      dl.getDouble(4), dl.getDouble(5))
    assert(se > 0.0 && lo < auc && auc < hi)
  }

  test("q_dsir: top-10 is weight-ordered and dominated by the target domain") {
    val r = rows("q_dsir")
    assert(r.length == 10)
    val ws = r.map(_.getDouble(3))
    assert(ws.sliding(2).forall(p => p(0) >= p(1) - 2e-6), "ordered desc")
    val en = r.count(_.getString(1) == "en")
    assert(en >= 5, s"expected target-domain majority, got $en/10 en")
  }

  test("q_rdd: effect is the intercept gap; both sides populated") {
    val Array(r) = rows("q_rdd")
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val (lo, hi, eff) = (r.getDouble(2), r.getDouble(3), r.getDouble(6))
    assert(math.abs(eff - (hi - lo)) < 3e-6, s"eff=$eff vs ${hi - lo}")
  }

  test("q_link_jaccard: score reconciles with counts and stays in (0,1]") {
    val r = rows("q_link_jaccard")
    assert(r.nonEmpty && r.length <= 15)
    r.foreach { x =>
      val (nc, du, dw, j) =
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5))
      assert(j > 0.0 && j <= 1.0)
      assert(math.abs(j - nc.toDouble / (du + dw - nc)) < 2e-6)
      assert(nc <= math.min(du, dw), "common neighbors bounded by degree")
    }
  }

  test("q_newsvendor: achieved service >= the 0.8 fractile by construction") {
    val r = rows("q_newsvendor")
    assert(r.length == 25)
    r.foreach { x =>
      val svc = x.getDouble(4)
      assert(svc >= 0.8 - 1e-9 && svc <= 1.0 + 1e-9, s"service $svc")
      assert(x.getLong(2) > 0, "stock level positive")
    }
  }

  test("q_theil_u: entropy inequalities and normalization hold") {
    val Array(r) = rows("q_theil_u")
    val (hl, hs, hj, mi) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    val (uls, usl) = (r.getDouble(5), r.getDouble(6))
    assert(mi >= -1e-9, "MI non-negative")
    assert(hj <= hl + hs + 1e-9 && hj >= math.max(hl, hs) - 1e-9)
    assert(uls >= 0.0 && uls <= 1.0 && usl >= 0.0 && usl <= 1.0)
    assert(math.abs(uls - mi / hl) < 3e-6 && math.abs(usl - mi / hs) < 3e-6)
  }

  test("q_tost: one-sided pair is ordered and the verdict matches") {
    val Array(r) = rows("q_tost")
    val (tl, tu, eq) = (r.getDouble(4), r.getDouble(5), r.getInt(6))
    assert(r.getDouble(3) > 0.0, "se > 0")
    assert(tl > tu, "lower t must exceed upper t by 2*delta/se")
    val expect = if (tl > 1.645 && tu < -1.645) 1 else 0
    assert(eq == expect, s"verdict $eq vs $expect (tl=$tl tu=$tu)")
  }

  test("q_sobel: indirect = a*b and z carries its sign") {
    val Array(r) = rows("q_sobel")
    val (a, b, ind, z) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(5))
    assert(math.abs(ind - a * b) < 3e-6)
    assert(ind * z >= 0.0, s"sign mismatch ind=$ind z=$z")
  }

  test("q_safety_stock: ROP decomposes; brand set matches q_newsvendor") {
    val r = rows("q_safety_stock")
    assert(r.length == 25)
    r.foreach { x =>
      val (mu, sig, ss, rop) = (x.getDouble(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(5))
      assert(sig >= 0.0 && ss >= 0.0)
      assert(math.abs(rop - (2.0 * mu + ss)) < 3e-6)
    }
    val nv = rows("q_newsvendor").map(_.getString(0)).toSet
    assert(r.map(_.getString(0)).toSet == nv)
  }

  test("q_embed_drift: slices partition the corpus; null-split z stays small") {
    val r = rows("q_embed_drift")
    assert(r.length == 10)
    val (na, nb) = (r.head.getLong(1), r.head.getLong(2))
    assert(r.forall(x => x.getLong(1) == na && x.getLong(2) == nb),
      "per-dim counts constant across dims")
    // a hash split of one population: |z| ordered desc, and even the
    // top dim should sit in a sane null band at this n
    val zs = r.map(x => math.abs(x.getDouble(5)))
    assert(zs.sliding(2).forall(p => p(0) >= p(1) - 2e-6))
    assert(zs.head < 6.0, s"null split drifted |z|=${zs.head}")
  }

  test("q_token_fertility: 5 langs; ratios reconcile with the count columns") {
    val r = rows("q_token_fertility")
    assert(r.length == 5)
    r.foreach { x =>
      val (nd, ch, tk) = (x.getLong(1), x.getLong(2), x.getLong(3))
      assert(math.abs(x.getDouble(4) - ch.toDouble / tk) < 2e-6)
      assert(math.abs(x.getDouble(5) - tk.toDouble / nd) < 2e-6)
    }
  }

  test("q_bigram_ppl: perplexities ordered, >= 1, bounded by V+max(c1)") {
    val r = rows("q_bigram_ppl")
    assert(r.length == 10)
    val ps = r.map(_.getDouble(3))
    assert(ps.sliding(2).forall(p => p(0) >= p(1) - 2e-6), "ordered desc")
    ps.foreach(p => assert(p >= 1.0, s"ppl $p < 1"))
    r.foreach(x => assert(x.getLong(2) > 0))
  }

  test("q_kpss: eta reconciles with its components; all positive") {
    val Array(r) = rows("q_kpss")
    val (n, s2, lrv, eta) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(s2 >= 0.0 && lrv > 0.0 && eta > 0.0)
    assert(math.abs(eta - s2 / (n * lrv)) < 1e-4,
      s"eta=$eta vs ${s2 / (n * lrv)}")
  }
}
