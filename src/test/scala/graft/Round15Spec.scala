package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the round-15 additions — the properties the shared
  * DuckDB oracle cannot see: the top-K BPE trainer's K>1 dependence
  * (a round-N rank-1 winner containing a round-N−1 merged token) and the
  * in-round rank-order application semantics, and the ×10 graph twins'
  * replica-disjointness (each scaling twin's result is exactly 10
  * id-shifted copies of the declared query's result).
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("bpeTrainTopK: K>1 dependence + in-round rank-order application") {
    import spark.implicits._
    // 5 × "a b c d". Round 1 counts: "a b"=5, "b c"=5, "c d"=5 — ranks
    // break alphabetically: rank1 = "a b", rank2 = "b c". Rank order is
    // the APPLICATION order within the round: after " a b " → " a_b "
    // there is no lone 'b' left, so rank2 "b c" no-ops and the round-1
    // corpus is "a_b c d" (NOT "a_b_c d" — the pin that ranks apply to
    // already-rewritten text). Round 2 counts on "a_b c d": "a_b c"=5,
    // "c d"=5 → rank1 = "a_b c" — a pair whose LEFT element only exists
    // after round 1's merge, the K>1 dependence property (r14 verdict
    // item 3); rank2 "c d" then no-ops because rank1 consumed the c.
    val docs = Seq.tabulate(5)(i => (i.toLong, "s", "a b c d"))
      .toDF("doc_id", "source", "text")
    val out = graft.operators.LlmOps.bpeTrainTopK(docs, 2, 2)
      .select("m1_1", "m1_2", "m2_1", "m2_2", "text", "tb")
      .distinct().collect()
    assert(out.length == 1, s"expected one distinct row, got ${out.length}")
    val r = out.head
    def s(n: String) = r.getString(r.fieldIndex(n))
    assert(s("m1_1") == "a b", s"m1_1 = ${s("m1_1")}")
    assert(s("m1_2") == "b c", s"m1_2 = ${s("m1_2")}")
    assert(s("m2_1") == "a_b c", s"m2_1 = ${s("m2_1")}")
    assert(s("m2_2") == "c d", s"m2_2 = ${s("m2_2")}")
    assert(s("text") == "a_b_c d", s"final = ${s("text")}")
    assert(r.getLong(r.fieldIndex("tb")) == 4L)
  }

  test("positional index: a literal doc probe prunes to one bucket") {
    // The direct-lookup path the bucketed layout buys beyond the
    // exchange-free joins PlanSpec pins: an equality literal on the
    // bucket column reads 1 of 16 buckets (SelectedBucketsCount), i.e.
    // a per-document fetch touches 1/16th of the index files.
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    graft.engine.Registry.byName("q_phrase_search_xl").run(spark, dir)
      .queryExecution // building the query ensures the lake fixture
    // DisableUnnecessaryBucketedScan turns the bucket layout off for a
    // bare filter (no distribution-requiring operator in the plan), so a
    // point-lookup reader pins autoBucketedScan off — the pruning knob a
    // direct-fetch path sets at 100 TB.
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val probe = spark.table("graft_idx_bucketed")
        .filter(col("doc_id") === 7L)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 16"), plan)
      assert(probe.count() > 0) // doc 7 exists at every SF
    } finally spark.conf.set(key, prev)
  }

  test("q_pca_power recovers the planted component (direction + scale)") {
    // The property the hash-match oracle cannot see: the 8 power
    // iterations actually CONVERGE to the planted direction
    // dᵢ = (i mod 4) − 1.5 (the organic embedding spectrum is flat —
    // top two eigenvalues 0.0209/0.0206 at sf0.1 — so without the plant
    // the component would be unconverged noise). At sf0.001 the plant is
    // 200 of 700 vectors, so λ ≈ (200/700)·‖d‖² = 160/7 ≈ 22.857 plus a
    // small organic + centering correction.
    val rows = graft.engine.Registry.byName("q_pca_power")
      .run(spark, "/root/testdata/sf0.001")
      .orderBy("dim").collect()
    assert(rows.length == 64)
    val v = rows.map(_.getDouble(1))
    val d = (1 to 64).map(i => (i % 4).toDouble - 1.5).toArray
    val dot = v.zip(d).map { case (a, b) => a * b }.sum
    val nd = math.sqrt(d.map(x => x * x).sum)
    val nv = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nv - 1.0) < 1e-5, s"loading norm $nv")
    assert(math.abs(dot) / (nd * nv) > 0.999,
      s"cos to planted direction = ${math.abs(dot) / (nd * nv)}")
    val eig = rows.head.getDouble(2)
    assert(eig > 20.0 && eig < 26.0, s"eigenvalue $eig")
  }

  test("graph ×10 twins: result = 10 disjoint id-shifted replicas") {
    // The replication contract the oracle hash-match already enforces
    // per engine pair but not structurally: every node/component id in
    // the twin is original_id + k·10,000,000 for k in 0..9, and the
    // k = 0 slice equals the declared query's result set restricted to
    // the same columns. Checked on the cheapest member (q_conncomp's
    // component histogram has no LIMIT-induced replica truncation at
    // sf0.001 — 10 copies of every component fit in the top 50 only if
    // the base has ≤ 5 components, so compare histograms per (size)
    // instead of ids for conncomp; for lpa compare the k = 0 slice).
    val dir = "/root/testdata/sf0.001"
    val base = graft.engine.Registry.byName("q_lpa").run(spark, dir)
      .collect().map(_.toSeq).toSet
    val twin = graft.engine.Registry.byName("q_lpa_xxl").run(spark, dir)
    val k0 = twin.filter(org.apache.spark.sql.functions
        .col("community") < 10000000L)
      .collect().map(_.toSeq).toSet
    assert(k0 == base, "k=0 slice of q_lpa_xxl must equal q_lpa")
    assert(twin.count() == 10 * base.size,
      "q_lpa_xxl must carry exactly 10 replicas of every community")
  }

  test("q_pca_top2 recovers both planted components in order") {
    // Deflation actually works: component 1 converges to d₁ᵢ =
    // (i mod 4) − 1.5 (λ₁ ≈ 200·80/800 = 20 at sf0.001) and component 2
    // — only reachable AFTER C − λ₁v₁v₁ᵀ removes d₁ — to d₂ = 1⃗
    // (λ₂ ≈ 100·64/800 = 8). A broken deflation would re-converge
    // component 2 onto d₁ (cos ≈ 1 to d₁, eigenvalue ≈ 20): both pins
    // below would fail loudly.
    val rows = graft.engine.Registry.byName("q_pca_top2")
      .run(spark, "/root/testdata/sf0.001")
      .orderBy("component", "dim").collect()
    assert(rows.length == 128)
    def cosTo(comp: Int, d: Int => Double): Double = {
      val v = rows.filter(_.getInt(0) == comp).map(_.getDouble(2))
      val dd = (1 to 64).map(d).toArray
      val dot = v.zip(dd).map { case (a, b) => a * b }.sum
      math.abs(dot) / math.sqrt(dd.map(x => x * x).sum)
    }
    assert(cosTo(1, i => (i % 4).toDouble - 1.5) > 0.999,
      s"component 1 must align with d1")
    assert(cosTo(2, _ => 1.0) > 0.99, s"component 2 must align with d2")
    val eig1 = rows.filter(_.getInt(0) == 1).head.getDouble(3)
    val eig2 = rows.filter(_.getInt(0) == 2).head.getDouble(3)
    assert(eig1 > 18 && eig1 < 23, s"lambda1 $eig1")
    assert(eig2 > 7 && eig2 < 10, s"lambda2 $eig2")
    assert(cosTo(2, i => (i % 4).toDouble - 1.5) < 0.05,
      "component 2 must be deflated away from d1")
  }

  test("q_pca_outliers ranks the planted off-plane vectors first") {
    // The residual screen works end-to-end: the 5 planted vectors along
    // p = (1,1,−1,−1) (⊥ both principal components, magnitudes
    // (2 + k/2)·p) must occupy the top 5 in descending-magnitude order,
    // with residual ≈ ‖x‖² (the projections remove almost nothing), and
    // the organic floor must sit orders of magnitude below (unit-norm
    // vectors, residual ≈ 1).
    val rows = graft.engine.Registry.byName("q_pca_outliers")
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 20)
    val top5 = rows.take(5).map(_.getLong(0))
    assert(top5.sameElements(Array(3000004L, 3000003L, 3000002L,
      3000001L, 3000000L)), s"top5 = ${top5.mkString(",")}")
    val r0 = rows.head.getDouble(1)
    assert(r0 > 950 && r0 < 1024, s"largest residual $r0 vs theory 1024")
    assert(rows(5).getDouble(1) < 2.0,
      s"organic floor ${rows(5).getDouble(1)} must be ~1")
  }

  test("q_kmeans_lloyd separates the planted clusters") {
    // The property the hash-match oracle cannot see: 5 Lloyd rounds
    // actually RECOVER the planted structure. Cluster g's planted members
    // sit at 2·[(dim−1) mod 4 = g] ± 0.25; the 500 unit-norm organic
    // vectors (mean ≈ 0, distance² ≈ 65 to every plant center vs ≈ 1 to
    // their own mass center) deterministically pool into ONE catch-all
    // cluster, so the equilibrium is 3 pure plant clusters (spike dims
    // exactly 2.0 ± the cancelling perturbation, off dims ± 0.25·mean)
    // and one 560-member mixed cluster whose spike mass is diluted to
    // 2·60/560 ≈ 0.21 but still dominates its off dims.
    val rows = graft.engine.Registry.byName("q_kmeans_lloyd")
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 4 * 64, s"got ${rows.length} rows")
    val sizes = rows.map(r => r.getInt(0) -> r.getInt(3)).toMap
    assert(sizes.size == 4, s"clusters = ${sizes.keySet}")
    assert(sizes.values.sum == 500 + 240,
      s"sizes ${sizes} must partition all 740 vectors")
    assert(sizes.values.forall(_ >= 60),
      s"every cluster keeps at least its 60 plants: $sizes")
    val seps = (0 to 3).map { g =>
      val cg = rows.filter(_.getInt(0) == g)
        .map(r => (r.getInt(1), r.getDouble(2)))
      val (spike, off) = cg.partition { case (dim, _) => (dim - 1) % 4 == g }
      assert(spike.length == 16 && off.length == 48)
      val sep = spike.map(_._2).sum / 16 - off.map(_._2).sum / 48
      assert(sep > 0.1, s"cluster $g spike-off separation $sep")
      sep
    }
    assert(seps.count(_ > 1.5) == 3,
      s"exactly 3 pure plant clusters expected, separations = $seps")
  }

  test("q_silhouette: argmin consistency bounds and plant-driven cohesion") {
    // Simplified silhouette with assignment = argmin over the SAME
    // centroid set forces a ≤ b, so every per-cluster mean must land in
    // [0, 1) — a structural consistency pin: the upper bound fails if a
    // cluster ever degenerates to copies of one point (a = 0 ⇒ s = 1,
    // the plant-parity bug this test caught), the lower if the final
    // assignment pass and the distance pass use different centroid
    // tables. The planted 60 per cluster (a = ‖±0.25 noise‖ = 2 exactly,
    // b ≈ √132 ≈ 11.5) push each mean well above the organic floor.
    val rows = graft.engine.Registry.byName("q_silhouette")
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 4, s"got ${rows.length} clusters")
    assert(rows.map(_.getInt(1)).sum == 740)
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= 0.0 && s < 1.0, s"cluster ${r.getInt(0)} mean_sil $s")
    }
    assert(rows.map(_.getDouble(2)).max > 0.3,
      "planted cohesion must lift at least one cluster's mean silhouette")
  }
}
