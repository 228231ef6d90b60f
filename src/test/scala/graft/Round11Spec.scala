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
}
