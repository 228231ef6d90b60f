package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the round-11 declared queries — properties the
  * shared-formula DuckDB oracle cannot see (it would reproduce a wrong
  * formula bit-for-bit): metric ranges, planted-row guarantees,
  * accounting identities, and cross-query consistency.
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def rows(q: String): Array[Row] =
    SparkEntry.queries(q)(spark, sf).collect()

  test("q_semdedup: >= 25 planted drops, per-cell accounting consistent") {
    val r = rows("q_semdedup")
    // every planted duplicate (identical embedding, higher id) must be
    // dropped; organic near-dups can only add to the count
    val totalDropped = r.map(_.getLong(2)).sum
    assert(totalDropped >= 25, s"expected >= 25 drops, got $totalDropped")
    r.foreach { x =>
      val (n, nd, rate) = (x.getLong(1), x.getLong(2), x.getDouble(3))
      assert(nd >= 0 && nd < n, s"cell ${x.getLong(0)}: $nd of $n dropped")
      assert(math.abs(rate - nd.toDouble / n) < 2e-6)
    }
    // cells partition the corpus: 500-slice + 25 planted copies
    assert(r.map(_.getLong(1)).sum >= 500)
  }

  test("q_ann_pq: recall consistent, self-neighbor always recovered") {
    val r = rows("q_ann_pq")
    assert(r.length == 5, "one row per probe")
    r.foreach { x =>
      val (n, rec) = (x.getLong(1), x.getDouble(2))
      assert(n >= 0 && n <= 10)
      assert(math.abs(rec - n / 10.0) < 2e-6)
    }
    // PQ on these random vectors must beat chance decisively: ADC
    // distance to the probe's OWN code is near zero, so overlap >= 1
    assert(r.forall(_.getLong(1) >= 1), "a probe lost even itself")
  }

  test("q_dup_coverage: planted copies force full-coverage docs") {
    val r = rows("q_dup_coverage")
    r.foreach { x =>
      val (n, cov, hi) = (x.getLong(1), x.getDouble(2), x.getLong(3))
      assert(cov >= 0.0 && cov <= 1.0)
      assert(hi >= 0 && hi <= n)
    }
    // 25 planted full copies + their originals all have coverage 1.0,
    // so high-coverage docs exist somewhere in the matrix
    assert(r.map(_.getLong(3)).sum >= 50,
      "planted copies + originals must be high-coverage")
  }

  test("q_dup_matrix: planted rotation pairs present, only cross-source") {
    val r = rows("q_dup_matrix")
    assert(r.nonEmpty, "planted cross-source copies must surface")
    r.foreach { x =>
      assert(x.getString(0) != x.getString(1), "same-source pair leaked")
      assert(x.getString(0) < x.getString(1), "pair not source-ordered")
      assert(x.getLong(2) > 0)
    }
    // 30 planted pairs spread over rotated source pairs
    assert(r.map(_.getLong(2)).sum >= 30)
  }

  test("q_g_test: G and MI consistency, additive identity vs dims") {
    val r = rows("q_g_test")
    assert(r.length == 1)
    val x = r.head
    val (n, nl, ns) = (x.getLong(0), x.getInt(1), x.getInt(2))
    val (df, g, mi) = (x.getInt(3), x.getDouble(4), x.getDouble(5))
    assert(df == (nl - 1) * (ns - 1))
    assert(g >= 0.0, s"G must be nonnegative, got $g")
    assert(math.abs(mi - g / (2.0 * n)) < 2e-6)
  }

  test("q_squared_ranks: score accounting vs closed form") {
    val r = rows("q_squared_ranks")
    assert(r.length == 1)
    val x = r.head
    val (n1, n2, t) = (x.getLong(0), x.getLong(1), x.getDouble(2))
    val mean = x.getDouble(3)
    val nT = (n1 + n2).toDouble
    // sum of squared midranks over all N rows = N * mean_score; T is
    // sample 1's share and must sit inside (0, N*mean)
    assert(t > 0.0 && t < nT * mean)
    // midranks of N items square-sum to at least 1²+...: mean >= 1
    assert(mean >= 1.0)
  }

  test("q_poisson_disp agrees with q_autocorr's day count") {
    val disp = rows("q_poisson_disp").head
    val nDays = disp.getLong(0)
    assert(nDays > 0)
    assert(disp.getDouble(1) > 0.0) // mean
    assert(disp.getDouble(2) >= 0.0) // variance
    val vmr = disp.getDouble(3)
    assert(math.abs(disp.getDouble(4) - (nDays - 1) * vmr) < 1e-3)
  }

  test("q_periodogram: 13 periods, power identity, nonnegative") {
    val r = rows("q_periodogram")
    assert(r.length == 13)
    r.foreach { x =>
      val (sc, ss, p) = (x.getDouble(2), x.getDouble(3), x.getDouble(4))
      val n = x.getLong(1).toDouble
      assert(p >= 0.0)
      assert(math.abs(p - 2.0 * (sc * sc + ss * ss) / n) < 1e-3,
        s"period ${x.getInt(0)}: power $p vs parts $sc/$ss")
    }
  }

  test("q_sortino: downside deviation positive, ratio sign = mean sign") {
    val x = rows("q_sortino").head
    val (mean, dd, sortino) = (x.getDouble(1), x.getDouble(2), x.getDouble(3))
    assert(dd > 0.0, "a multi-year revenue series has down days")
    assert(mean * sortino >= 0.0, "sortino sign must follow the mean")
  }

  test("q_katz: scores >= 1, monotone vs in-degree floor, top-50 sorted") {
    val r = rows("q_katz")
    assert(r.length == 50)
    r.foreach(x => assert(x.getDouble(1) >= 1.0,
      "Katz includes every node's own unit term"))
    val scores = r.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "not sorted desc")
  }

  test("q_reciprocity: weighted <= 1, binary <= 1, both nonneg") {
    val x = rows("q_reciprocity").head
    val (ne, wt, wr) = (x.getLong(0), x.getLong(1), x.getLong(2))
    assert(ne > 0 && wt > 0)
    assert(wr >= 0 && wr <= wt)
    val (rw, rb) = (x.getDouble(3), x.getDouble(4))
    assert(rw >= 0.0 && rw <= 1.0)
    assert(rb >= 0.0 && rb <= 1.0)
    // weighted reciprocity cannot exceed binary by the min() bound when
    // weights are symmetric-capped... both live in [0,1]; identity check:
    assert(math.abs(rw - wr.toDouble / wt) < 2e-6)
  }

  test("q_gopher_rules: planted junk trips letter+stopword rules only") {
    val r = rows("q_gopher_rules")
    r.foreach { x =>
      val n = x.getLong(1)
      val counts = (2 to 7).map(x.getLong)
      counts.foreach(c => assert(c >= 0 && c <= n))
      // all-rules passes cannot exceed any single rule's passes
      assert(counts.last <= counts.init.min)
      val rate = x.getDouble(8)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - counts.last.toDouble / n) < 2e-6)
    }
    // the 10 planted all-digit docs must fail somewhere: total passes <
    // total docs
    val nDocs = r.map(_.getLong(1)).sum
    val nPass = r.map(_.getLong(7)).sum
    assert(nPass < nDocs, "planted junk passed every rule")
    // r3 measures the NON-alphanumeric ratio: the fixture corpus (and the
    // digit-only junk) is symbol-free, so every doc must pass r3 — this
    // pins the formula direction the shared-formula oracle cannot see
    // (an inverted ratio fails ALL docs and zeroes n_pass_all).
    val nSym = r.map(_.getLong(4)).sum
    assert(nSym == nDocs, s"symbol-free docs must all pass r3: $nSym/$nDocs")
    // and with r3 no longer vacuously zero, ordinary docs must pass ALL
    // rules somewhere
    assert(nPass > 0, "no doc passed all rules on the clean fixture")
  }

  test("q_coint: ADF-t sign matches rho, residual moments consistent") {
    val x = rows("q_coint").head
    val n = x.getLong(0)
    assert(n > 10)
    val (rho, t) = (x.getDouble(3), x.getDouble(4))
    assert(rho * t >= 0.0, s"adf_t $t must carry rho's sign $rho")
    assert(math.abs(rho) < 2.0, s"explosive rho $rho")
  }

  test("q_fisher_ci: interval brackets r, bounds inside [-1,1]") {
    val r = rows("q_fisher_ci")
    assert(r.nonEmpty)
    r.foreach { x =>
      val (n, rr, lo, hi) =
        (x.getLong(1), x.getDouble(2), x.getDouble(4), x.getDouble(5))
      assert(n >= 10)
      assert(rr >= -1.0 && rr <= 1.0)
      assert(lo <= rr + 1e-9 && rr <= hi + 1e-9, s"CI [$lo,$hi] vs r $rr")
      assert(lo >= -1.0 && hi <= 1.0)
    }
  }

  test("q_em_poisson2: mixture weight in (0,1), lambdas ordered, ll finite") {
    val x = rows("q_em_poisson2").head
    val (n, w1) = (x.getLong(0), x.getDouble(1))
    val (l1, l2, ll) = (x.getDouble(2), x.getDouble(3), x.getDouble(4))
    assert(n > 0)
    assert(w1 > 0.0 && w1 < 1.0, s"degenerate weight $w1")
    assert(l1 > 0.0 && l2 > 0.0)
    assert(l1 < l2, s"init ordering must persist: $l1 vs $l2")
    assert(!ll.isNaN && ll < 0.0, s"log-likelihood $ll")
  }

  test("q_kmv_setops: estimates within bound, inclusion-exclusion exact") {
    val x = rows("q_kmv_setops").head
    val (exA, exB, exU, exI) =
      (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))
    assert(exI == exA + exB - exU)
    assert(exI >= 0 && exI <= math.min(exA, exB))
    assert(x.getBoolean(8) && x.getBoolean(9) && x.getBoolean(10),
      "a KMV estimate left its declared error bound")
    // the intersection estimate is unpinned (higher variance) but must
    // at least be nonnegative and below the union estimate
    val (estU, estI) = (x.getDouble(6), x.getDouble(7))
    assert(estI >= 0.0 && estI <= estU)
  }

  test("q_holm: step-down dominates BH-style rejection monotonically") {
    val r = rows("q_holm")
    // p_holm is a running max: must be monotone nondecreasing in rank
    val holms = r.sortBy(_.getInt(1)).map(_.getDouble(6))
    assert(holms.zip(holms.tail).forall { case (a, b) => a <= b + 1e-12 },
      "p_holm not monotone in rank")
    r.foreach { x =>
      val (p, ph, pb) = (x.getDouble(5), x.getDouble(6), x.getDouble(7))
      assert(ph >= p - 1e-12, "adjusted p below raw p")
      assert(pb >= ph - 1e-6, "Holm must dominate Bonferroni (ph <= pb)")
      assert(ph <= 1.0 + 1e-12 && pb <= 1.0 + 1e-12)
    }
    // rejection set is a prefix of the rank order
    val rej = r.sortBy(_.getInt(1)).map(_.getInt(8))
    assert(rej.zip(rej.tail).forall { case (a, b) => a >= b },
      "rejections not a rank prefix")
  }

  test("q_dedup_shift: planted shifted clones caught despite misalignment") {
    val r = rows("q_dedup_shift")
    // the 3-token prefix shifts every aligned chunk boundary, so ONLY a
    // stride-1 scheme can see these; each planted clone (and its source)
    // must clear the 0.5-coverage band
    val planted = r.filter(_.getLong(0) >= 500000L)
    assert(planted.nonEmpty, "no planted clone surfaced")
    r.foreach { x =>
      val (nw, nd, frac, run) =
        (x.getInt(1), x.getInt(2), x.getDouble(3), x.getInt(4))
      assert(nd >= 1 && nd <= nw, s"doc ${x.getLong(0)}: $nd of $nw")
      assert(run >= 1 && run <= nd)
      assert(math.abs(frac - nd.toDouble / nw) < 2e-6)
      assert(frac >= 0.5 - 1e-9)
    }
    // every planted clone's SOURCE doc is also fully covered
    val ids = r.map(_.getLong(0)).toSet
    planted.foreach { x =>
      assert(ids.contains(x.getLong(0) - 500000L),
        s"clone ${x.getLong(0)} surfaced without its source")
    }
  }

  test("q_mix_report: shares/weights sum to 1, planted dups visible") {
    val r = rows("q_mix_report")
    assert(r.length >= 2, "need multiple sources")
    val wSum = r.map(_.getDouble(3)).sum
    val sSum = r.map(_.getDouble(4)).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum $wSum")
    assert(math.abs(sSum - 1.0) < 1e-4, s"shares sum $sSum")
    r.foreach { x =>
      val (w, s, boost) = (x.getDouble(3), x.getDouble(4), x.getDouble(5))
      assert(math.abs(boost - w / s) < 1e-3 * boost.abs.max(1.0))
      val (edr, cdr) = (x.getDouble(6), x.getDouble(7))
      assert(edr >= 0.0 && edr < 1.0)
      assert(cdr >= 0.0 && cdr <= 1.0)
    }
    // planted exact copies (doc_id < 15) make SOME source's rates > 0
    assert(r.exists(_.getDouble(6) > 0.0), "no exact-dup rate > 0")
    assert(r.exists(_.getDouble(7) > 0.0), "no chunk-dup rate > 0")
  }

  test("q_mh_or: MH estimate inside the stratum-OR envelope") {
    val r = rows("q_mh_or")
    assert(r.length >= 2, "need multiple ship-year strata")
    val ors = r.map(_.getDouble(5))
    val mh = r.map(_.getDouble(6)).distinct
    val crude = r.map(_.getDouble(7)).distinct
    assert(mh.length == 1 && crude.length == 1,
      "pooled columns must repeat identically")
    // MH is a convex combination of the stratum ORs
    assert(mh.head >= ors.min - 1e-6 && mh.head <= ors.max + 1e-6,
      s"MH ${mh.head} outside [${ors.min}, ${ors.max}]")
    r.foreach { x =>
      (1 to 4).foreach(i => assert(x.getLong(i) > 0, "empty 2x2 cell"))
    }
  }

  test("q_icc: variance decomposition in range, 25 brands") {
    val r = rows("q_icc").head
    assert(r.getInt(0) == 25, s"brands: ${r.getInt(0)}")
    val (k0, msb, msw, icc) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(k0 > 1.0 && msb > 0.0 && msw > 0.0)
    assert(icc > -1.0 / (k0 - 1.0) - 1e-6 && icc <= 1.0 + 1e-9,
      s"icc $icc out of range for k0 $k0")
    // brand is noise w.r.t. price in TPC-H-ish data: ICC must be small
    assert(icc.abs < 0.5, s"implausible brand ICC $icc")
  }

  test("q_dw and q_arch_lm: statistic identities and ranges") {
    val dw = rows("q_dw").head
    assert(dw.getDouble(1) >= 0.0 && dw.getDouble(1) <= 4.0)
    assert(math.abs(dw.getDouble(2) - (1.0 - dw.getDouble(1) / 2.0)) < 1e-5)
    val al = rows("q_arch_lm").head
    val (n, r2, lm, flag) =
      (al.getLong(0), al.getDouble(2), al.getDouble(3), al.getInt(4))
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(math.abs(lm - n * r2) < 1e-3)
    assert(flag == (if (lm > 3.841) 1 else 0))
  }

  test("q_chow: pooled SSR dominates, segments partition the days") {
    val r = rows("q_chow").head
    val (n, n1, n2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n == n1 + n2 && n1 > 0 && n2 > 0)
    val (sp, s1, s2, f) = (r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getDouble(6))
    assert(sp >= s1 + s2 - 1e-6, "pooled SSR smaller than split SSRs")
    assert(f >= 0.0)
    assert(math.abs(f - ((sp - s1 - s2) / 2.0) / ((s1 + s2) / (n - 4.0)))
      < 1e-3 * f.max(1.0))
  }

  test("q_cronbach: alpha identity and exact-SS consistency") {
    val r = rows("q_cronbach").head
    assert(r.getInt(1) == 5)
    val (ssI, ssT, a) = (r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(ssI > 0 && ssT > 0)
    assert(a <= 1.0 + 1e-9, s"alpha $a > 1")
    assert(math.abs(a - 1.25 * (1.0 - ssI.toDouble / ssT)) < 2e-6)
  }

  test("q_kendall_w: W in [0,1], chi2 identity, full brand set") {
    val r = rows("q_kendall_w").head
    val (m, n, s4) = (r.getLong(0), r.getInt(1), r.getLong(2))
    assert(n == 25, s"brands $n")
    assert(m >= 2, s"years $m")
    val (w, chi2) = (r.getDouble(3), r.getDouble(4))
    assert(w >= 0.0 && w <= 1.0 + 1e-9, s"W $w")
    assert(math.abs(w - 3.0 * s4 / (m.toDouble * m *
      (n.toDouble * n * n - n))) < 2e-6)
    assert(math.abs(chi2 - m * (n - 1.0) * w) < 1e-3)
  }

  test("q_breusch_pagan: LM identity and range") {
    val r = rows("q_breusch_pagan").head
    val (n, r2, lm, flag) =
      (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getInt(4))
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(math.abs(lm - n * r2) < 1e-3)
    assert(flag == (if (lm > 3.841) 1 else 0))
  }

  test("q_cooks_top: 10 rows, ordered, leverage in (0,1)") {
    val r = rows("q_cooks_top")
    assert(r.length == 10)
    val ds = r.map(_.getDouble(4))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b - 1e-12 },
      "not ordered by Cook's D")
    r.foreach { x =>
      assert(x.getDouble(4) >= 0.0)
      val h = x.getDouble(3)
      assert(h > 0.0 && h < 1.0, s"leverage $h")
    }
  }

  test("q_decontam_span: planted clones are single full spans") {
    val r = rows("q_decontam_span")
    val planted = r.filter(_.getLong(0) >= 1000000L)
    assert(planted.size >= 10, s"planted hits: ${planted.size}")
    planted.foreach { x =>
      // a verbatim copy of a benchmark doc: every window hits, one span
      assert(x.getInt(2) == 1, s"clone ${x.getLong(0)} spans ${x.getInt(2)}")
      assert(x.getInt(4) == 0, "clone's first hit not at position 0")
      assert(x.getInt(3) == x.getInt(1), "clone run shorter than coverage")
    }
    r.foreach { x =>
      val (nc, ns, mr, fp) =
        (x.getInt(1), x.getInt(2), x.getInt(3), x.getInt(4))
      assert(nc >= 1 && ns >= 1 && mr >= 1 && fp >= 0)
      assert(mr <= nc && ns <= nc)
    }
  }

  test("q_dedup_cascade: funnel chains, every stage removes its plants") {
    val r = rows("q_dedup_cascade")
    assert(r.length == 3, "one row per stage")
    val byStage = r.map(x => x.getInt(0) ->
      (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // funnel chaining: stage N's n_in is stage N-1's n_out
    assert(byStage(2)._1 == byStage(1)._2, "stage2 in != stage1 out")
    assert(byStage(3)._1 == byStage(2)._2, "stage3 in != stage2 out")
    r.foreach { x =>
      assert(x.getLong(2) - x.getLong(3) == x.getLong(4), "removed identity")
      assert(x.getLong(4) >= 0 && x.getLong(3) > 0)
    }
    // planted clones: 25 exact, 20 leading-space (canonical), 15
    // same-20-token-prefix — each stage must remove at least its plants
    assert(byStage(1)._3 >= 25, s"exact removed ${byStage(1)._3} < 25")
    assert(byStage(2)._3 >= 20, s"canonical removed ${byStage(2)._3} < 20")
    assert(byStage(3)._3 >= 15, s"prefix removed ${byStage(3)._3} < 15")
  }

  test("q_ccnet_bins: 5 langs x 3 bins, score monotone across bins") {
    val r = rows("q_ccnet_bins")
    assert(r.length == 15, s"expected 5 langs x 3 bins, got ${r.length}")
    assert(r.map(_.getLong(2)).sum == 500L, "bins must partition the corpus")
    r.groupBy(_.getString(0)).foreach { case (lang, g) =>
      assert(g.map(_.getInt(1)).sorted.sameElements(Array(1, 2, 3)))
      val byBin = g.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(byBin(0) <= byBin(1) && byBin(1) <= byBin(2),
        s"$lang: tercile means not monotone: ${byBin.mkString(",")}")
      // NTILE: earlier buckets take the remainder, sizes differ by <= 1
      val sizes = g.sortBy(_.getInt(1)).map(_.getLong(2))
      assert(sizes(0) >= sizes(1) && sizes(1) >= sizes(2) &&
        sizes(0) - sizes(2) <= 1, s"$lang: ${sizes.mkString(",")}")
    }
  }

  test("q_cosine_hist: pairs account for n-1, means inside bin edges") {
    val r = rows("q_cosine_hist")
    assert(r.map(_.getLong(1)).sum == 499L, "500 vectors -> 499 pairs")
    r.foreach { x =>
      val (bin, avg) = (x.getInt(0), x.getDouble(2))
      assert(bin >= -10 && bin <= 9)
      assert(avg >= bin / 10.0 - 2e-6 && avg <= (bin + 1) / 10.0 + 2e-6,
        s"bin $bin mean $avg outside its edges")
    }
    // random 64-dim embeddings: mass concentrates near 0, no collapse —
    // the modal bin must sit inside [-0.3, 0.3)
    val modal = r.maxBy(_.getLong(1)).getInt(0)
    assert(modal >= -3 && modal <= 2, s"modal bin $modal suggests collapse")
  }

  test("q_epoch_plan: weights sum to 1, cap binds iff raw epochs > 4") {
    val r = rows("q_epoch_plan")
    assert(r.length == 20, "one row per source")
    val wsum = r.map(_.getDouble(2)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum $wsum")
    r.foreach { x =>
      val (tok, tgt, raw, ep, planned, deficit) =
        (x.getLong(1), x.getDouble(3), x.getDouble(4), x.getDouble(5),
          x.getDouble(6), x.getDouble(7))
      assert(math.abs(ep - math.min(raw, 4.0)) < 1e-9, "cap identity")
      assert(math.abs(planned - ep * tok) < 0.011, "planned identity")
      assert(math.abs(deficit - (tgt - planned)) < 0.011, "deficit identity")
      if (raw <= 4.0) assert(math.abs(deficit) < 0.011,
        s"uncapped source carries deficit $deficit")
      else assert(deficit > 0, "capped source must carry a deficit")
    }
    // sf0.001 has sources on both sides of the cap (n_tokens 1212..1657
    // vs uniform target ~5588) — both branches must be exercised
    assert(r.exists(_.getDouble(4) > 4.0) && r.exists(_.getDouble(4) <= 4.0))
  }

  test("q_chunk_plan: closed-form chunk accounting identities hold") {
    val r = rows("q_chunk_plan")
    assert(r.length == 20, "one row per source")
    r.foreach { x =>
      val (nd, nt, nc, ct, mx, exp) = (x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getDouble(6))
      // sum over docs of n + 20*(chunks-1) telescopes to this identity
      assert(ct == nt + 20 * (nc - nd), s"${x.getString(0)}: mass identity")
      assert(nc >= nd, "every doc emits at least one chunk")
      assert(mx >= 1 && exp >= 1.0 - 1e-9)
      assert(math.abs(exp - ct.toDouble / nt) < 2e-6)
    }
  }

  test("q_vocab_overlap: true-jaccard identity, bounded pairs, ordered keys") {
    val r = rows("q_vocab_overlap")
    assert(r.nonEmpty && r.length <= 190, s"${r.length} pairs of 20 sources")
    r.foreach { x =>
      val (a, b, n, sa, sb, j) = (x.getString(0), x.getString(1),
        x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5))
      assert(a < b, "pair keys must be ordered")
      assert(sa >= 1 && sa <= 50 && sb >= 1 && sb <= 50,
        "top-list sizes bounded by the 50 cutoff")
      assert(n >= 1 && n <= math.min(sa, sb),
        "intersection bounded by the smaller list")
      // true set Jaccard over the ACTUAL list sizes (the closed fixture
      // vocabulary gives sources ~30 distinct terms, not 50)
      assert(math.abs(j - n.toDouble / (sa + sb - n)) < 2e-6)
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("q_template_docs: planted header/footer family recovered intact") {
    val r = rows("q_template_docs")
    // the 12 planted docs share prefix+suffix digests and nothing else
    // does (md5 middles are unique), so exactly one group holds them all
    val planted = r.filter(_.getLong(4) >= 730000L)
    assert(planted.length == 1, s"expected 1 planted group, ${planted.length}")
    assert(planted.head.getLong(2) == 12, "all 12 plants in one template")
    r.foreach { x =>
      assert(x.getLong(2) >= 3 && x.getLong(3) >= 1)
      assert(x.getLong(3) <= x.getLong(2), "sources bounded by members")
    }
  }

  test("q_split_leakage: planted val clones all leak, identities hold") {
    val r = rows("q_split_leakage")
    assert(r.length == 20, "one row per source, test-only sources included")
    // same md5 bucket the query uses: a doc plants iff it lands in train
    def bucket(i: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) % 10
    }
    val planted = (0 until 15).count(bucket(_) < 8)
    assert(planted >= 8, s"fixture drift: only $planted plantable clones")
    assert(r.map(_.getLong(3)).sum >= planted,
      s"planted $planted verbatim val clones must all leak")
    r.foreach { x =>
      val (nv, nl, rate) = (x.getLong(2), x.getLong(3), x.getDouble(4))
      assert(nl <= nv, "leaky bounded by val size")
      if (nv > 0) assert(math.abs(rate - nl.toDouble / nv) < 2e-6)
      else assert(nl == 0 && rate == 0.0)
    }
  }

  test("q_topic_tag: topics partition the corpus") {
    val r = rows("q_topic_tag")
    assert(r.map(_.getLong(2)).sum == 500L)
    val topics = Set("joins", "streaming", "scans")
    r.foreach { x =>
      assert(topics.contains(x.getString(1)))
      assert(x.getLong(2) >= 1 && x.getDouble(3) >= 0.0)
    }
    // the DB-word vocabulary guarantees hits: corpus-wide mean > 1
    val w = r.map(x => x.getDouble(3) * x.getLong(2)).sum / 500.0
    assert(w > 1.0, s"mean best-topic hits $w suspiciously low")
  }

  test("q_pad_waste: window accounting identities") {
    val r = rows("q_pad_waste")
    assert(r.length == 20)
    r.foreach { x =>
      val (nd, nt, nw, pad, u) = (x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5))
      assert(nw >= nd, "every doc takes at least one window")
      assert(pad == 2048 * nw - nt, "pad identity")
      assert(u > 0.0 && u <= 1.0)
      assert(math.abs(u - nt.toDouble / (2048.0 * nw)) < 2e-6)
    }
  }

  test("q_cell_balance: 9 cells partition 500 vectors, HHI bounds hold") {
    val r = rows("q_cell_balance")
    assert(r.length == 1)
    val x = r.head
    val (k, n, mn, mx) =
      (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))
    assert(k == 9, "the fixed-count bottom-9-by-hash sample seeds 9 cells")
    assert(n == 500, "assignment must partition the corpus slice")
    val (avg, imb, esf) = (x.getDouble(4), x.getDouble(5), x.getDouble(6))
    assert(mn >= 1 && mn <= mx)
    assert(math.abs(avg - n.toDouble / k) < 2e-6)
    assert(math.abs(imb - mx.toDouble * k / n) < 2e-6)
    assert(imb >= 1.0 - 1e-9, "max cell cannot be below the mean")
    // Cauchy-Schwarz: expected scan fraction >= 1/k, <= max share
    assert(esf >= 1.0 / k - 2e-6 && esf <= mx.toDouble / n + 2e-6)
  }

  test("q_band_sweep: candidacy nests with band width, plants all high") {
    val r = rows("q_band_sweep").sortBy(_.getInt(0))
    assert(r.length == 3)
    assert(r.map(_.getInt(0)).sameElements(Array(2, 4, 8)))
    val cand = r.map(_.getLong(2))
    val high = r.map(_.getLong(3))
    // a pair matching a wide band matches all its sub-bands: b=2 ⊆ b=4 ⊆ b=8
    assert(cand(0) <= cand(1) && cand(1) <= cand(2), "nesting violated")
    assert(high(0) <= high(1) && high(1) <= high(2))
    // 50 planted identical clones: n_match = 16 -> candidate + high in
    // EVERY config
    assert(high(0) >= 50, s"plants must survive the coarsest config: ${high(0)}")
    r.foreach { x =>
      assert(x.getLong(3) <= x.getLong(2))
      val rate = x.getDouble(4)
      assert(rate >= 0.0 && rate <= 1.0)
      if (x.getLong(2) > 0)
        assert(math.abs(rate - x.getLong(3).toDouble / x.getLong(2)) < 2e-6)
    }
  }

  test("q_lang_mismatch: counts bounded, rates exact, corpus covered") {
    val r = rows("q_lang_mismatch")
    assert(r.length == 20, "one row per source")
    assert(r.map(_.getLong(1)).sum == 500L)
    r.foreach { x =>
      val (n, unk, mis, rate) =
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))
      assert(unk + mis <= n, "unknown and mismatch are disjoint")
      assert(math.abs(rate - mis.toDouble / n) < 2e-6)
    }
  }

  test("q_contam_matrix: all 4 shards hit, gram counts dominate docs") {
    val r = rows("q_contam_matrix")
    assert(r.map(_.getInt(0)).distinct.sorted.sameElements(Array(0, 1, 2, 3)),
      "planted bench copies must light up every shard")
    // each of the 20 planted full copies contaminates at least its own
    // shard, so the matrix covers >= 20 doc hits in total
    assert(r.map(_.getLong(2)).sum >= 20)
    r.foreach { x =>
      assert(x.getLong(2) >= 1)
      assert(x.getLong(3) >= x.getLong(2),
        "every contaminated doc shares at least one gram")
    }
  }

  test("q_js_drift: JS bounded by ln 2, vocab accounting consistent") {
    val r = rows("q_js_drift")
    assert(r.length == 1)
    val x = r.head
    val (va, vb, vs, js) =
      (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))
    assert(va > 0 && vb > 0)
    assert(vs <= math.min(va, vb), "shared vocab bounded by either side")
    assert(js >= 0.0 && js <= math.log(2.0) + 1e-6,
      s"JS divergence $js outside [0, ln 2]")
    // same-generator halves cannot be maximally divergent
    assert(js < 0.5, s"JS $js suspiciously high for homogeneous halves")
  }

  test("q_sample_topup: rate identities, capped langs keep everything") {
    val r = rows("q_sample_topup")
    assert(r.length == 5, "one row per language")
    val total = r.map(_.getLong(1)).sum
    assert(total == 500L)
    r.foreach { x =>
      val (n, tgt, rate, kept) =
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))
      assert(tgt == total * 15 / 100, "uniform 15% target")
      assert(rate == math.min(100L, tgt * 100 / n), "rate identity")
      assert(kept <= n)
      if (rate == 100L) assert(kept == n, "uncapped lang must keep all")
      else assert(kept < n, "downsampled lang cannot keep everything")
    }
    // the dominant language must actually be downsampled at sf0.001
    val en = r.find(_.getString(0) == "en").get
    assert(en.getLong(3) < 100L, "en (193 of 500) must get a sub-100 rate")
  }

  test("chunk/pad/epoch plans agree on per-source token mass and weights") {
    // three independent plan queries derive n_tokens from the same one
    // tokenize pass — any drift means a tokenization contract broke
    val chunk = rows("q_chunk_plan").map(x => x.getString(0) -> x.getLong(2)).toMap
    val pad = rows("q_pad_waste").map(x => x.getString(0) -> x.getLong(2)).toMap
    val epoch = rows("q_epoch_plan").map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(chunk == pad, "chunk vs pad token mass drift")
    assert(chunk == epoch, "chunk vs epoch token mass drift")
    // epoch plan's mixture weights must equal q_mix_weights' exactly
    val w1 = rows("q_epoch_plan").map(x => x.getString(0) -> x.getDouble(2)).toMap
    val w2 = rows("q_mix_weights").map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(w1 == w2, "epoch plan weights diverged from q_mix_weights")
  }

  test("q_rare_token_docs: 10 planted hapax carriers, identities hold") {
    val r = rows("q_rare_token_docs")
    assert(r.length == 20, "one row per source")
    assert(r.map(_.getLong(1)).sum == 510L, "500 docs + 10 plants")
    // the closed synthetic vocabulary has no organic hapaxes, so the
    // carriers are EXACTLY the 10 planted zqx_N docs, one hapax each
    assert(r.map(_.getLong(2)).sum == 10L, "planted carriers only")
    assert(r.map(_.getLong(3)).sum == 10L, "one hapax per plant")
    r.foreach { x =>
      val (n, c, h, rate) =
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))
      assert(c <= n && h >= c)
      assert(math.abs(rate - c.toDouble / n) < 2e-6)
    }
  }

  test("q_len_drift: PSI nonnegative and small for homogeneous halves") {
    val r = rows("q_len_drift")
    assert(r.length == 1)
    val x = r.head
    val (nb, na2, nb2, psi) =
      (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))
    assert(nb >= 1 && nb <= 10, "at most 10 fixed-width buckets")
    assert(na2 + nb2 == 500L, "halves partition the corpus")
    // every (p-q)*ln(p/q) term is nonnegative
    assert(psi >= -1e-9, s"PSI $psi negative")
    assert(psi < 0.25, s"PSI $psi too large for same-generator halves")
  }

  test("q_contam_matrix sandwiched by q_decontam's doc count") {
    // every doc q_decontam flags hits at least one of the 4 shards, and
    // can hit at most all 4 — so the matrix's doc-count mass is bounded
    // both ways by the flat decontam row count (both use the same 5-gram
    // digests and the same planted copies)
    val decontam = rows("q_decontam").length.toLong
    val matrixMass = rows("q_contam_matrix").map(_.getLong(2)).sum
    assert(matrixMass >= decontam,
      s"matrix mass $matrixMass below decontam count $decontam")
    assert(matrixMass <= 4 * decontam,
      s"matrix mass $matrixMass exceeds 4x decontam count $decontam")
  }

  test("q_spectral_entropy consistent with q_periodogram") {
    val se = rows("q_spectral_entropy").head
    assert(se.getInt(0) == 13)
    val h = se.getDouble(3)
    assert(h >= 0.0 && h <= 1.0 + 1e-9, s"entropy $h")
    val pg = rows("q_periodogram")
    val powers = pg.map(x => (x.getInt(0), x.getDouble(4)))
    // same trig numerics → total power and argmax period must agree
    assert(math.abs(se.getDouble(1) - powers.map(_._2).sum) <
      1e-3 * se.getDouble(1).max(1.0))
    val peak = powers.filter(p =>
      math.abs(p._2 - powers.map(_._2).max) < 1e-9).map(_._1).min
    assert(se.getInt(2) == peak, s"peak ${se.getInt(2)} vs periodogram $peak")
  }
}
