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
}
