package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PipelineOps

/** Invariant pins for the round-13 declared queries — properties the
  * shared-formula DuckDB oracle cannot see (it would reproduce a wrong
  * rule direction bit-for-bit, the round-11 gopher-r3 lesson): per-rule
  * verdicts on crafted documents, planted-family drop accounting, and
  * span-merge exactness.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def rows(q: String): Array[Row] =
    SparkEntry.queries(q)(spark, sf).collect()

  test("repetitionRuleFlags: each rule fires on its crafted doc only") {
    import spark.implicits._
    val clean = "the quick brown fox jumps over a lazy dog today\n" +
      "meanwhile seventeen curious students walked toward the harbor\n" +
      "finally everyone agreed that dinner should include fresh bread"
    val dupLine = Seq.fill(5)("alpha beta gamma delta").mkString("\n")
    val dupPara = Seq.fill(3)(
      "one two three four five six seven eight nine ten").mkString("\n\n")
    val loop = ("lp qy " * 40).trim
    val docs = Seq(
      ("s", 1L, clean), ("s", 2L, dupLine), ("s", 3L, dupPara),
      ("s", 4L, loop)).toDF("source", "doc_id", "text")
    val f = PipelineOps.repetitionRuleFlags(docs)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // clean multi-line doc passes every rule (distinct lines, one of each
    // paragraph, no repeated grams beyond stopwords)
    assert(f(1L) == ((1L, 1L, 1L, 1L, 1L, 1L)), s"clean: ${f(1L)}")
    // 5 identical lines -> duplicate-line fraction 1.0 > 0.3
    assert(f(2L)._1 == 0L, s"dupLine should fail r_line: ${f(2L)}")
    // 3 identical blank-line-separated paragraphs -> dup-para frac 1.0
    assert(f(3L)._2 == 0L, s"dupPara should fail r_para: ${f(3L)}")
    // the paragraph clone also duplicates its lines
    assert(f(3L)._1 == 0L, s"dupPara also fails r_line: ${f(3L)}")
    // 2-token loop: top 2-gram owns ~the whole doc; every 10-token
    // window recurs, islands cover everything
    assert(f(4L)._3 == 0L, s"loop should fail r_top2: ${f(4L)}")
    assert(f(4L)._6 == 0L, s"loop should fail r_dup10: ${f(4L)}")
    // single-line docs can never fail the line/para rules
    assert(f(4L)._1 == 1L && f(4L)._2 == 1L)
  }

  test("q_repetition_rules: plant-family accounting is exact") {
    import spark.implicits._
    val rich = graft.engine.Tables.documents(spark, sf)
      .filter($"doc_id" < 8 &&
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split($"text", " ")) >= 12)
      .count()
    assert(rich > 0, "fixture has no rich docs < 8 — plants vacuous")
    val r = rows("q_repetition_rules")
    val nDocs = r.map(_.getLong(1)).sum
    val organic = graft.engine.Tables.documents(spark, sf).count()
    assert(nDocs == organic + 3 * rich, s"$nDocs vs $organic + 3*$rich")
    // organic docs are single-line/single-paragraph: ONLY the dup-line
    // family (+800000) and the dup-para family (+810000, whose lines are
    // also clones) can fail the line rule; only the dup-para family can
    // fail the paragraph rule — exact counts, not bounds
    val lineFails = r.map(x => x.getLong(1) - x.getLong(2)).sum
    assert(lineFails == 2 * rich, s"line fails $lineFails != 2*$rich")
    val paraFails = r.map(x => x.getLong(1) - x.getLong(3)).sum
    assert(paraFails == rich, s"para fails $paraFails != $rich")
    // every loop plant (+820000) fails top-2-gram mass and 10-gram
    // coverage (organic docs may add, so lower bounds)
    val top2Fails = r.map(x => x.getLong(1) - x.getLong(4)).sum
    assert(top2Fails >= rich, s"top2 fails $top2Fails < $rich")
    val dup10Fails = r.map(x => x.getLong(1) - x.getLong(7)).sum
    assert(dup10Fails >= rich, s"dup10 fails $dup10Fails < $rich")
    r.foreach { x =>
      val (n, all) = (x.getLong(1), x.getLong(8))
      assert(all <= n)
      assert(math.abs(x.getDouble(9) - all.toDouble / n) < 2e-6)
    }
    // the corpus is not degenerate: most docs pass all rules
    val passAll = r.map(_.getLong(8)).sum
    assert(passAll * 10 >= nDocs * 8, s"only $passAll of $nDocs pass")
  }

  test("q_dedup_span: a 3-token-offset clone is ONE maximal span") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val expect = graft.engine.Tables.documents(spark, sf)
      .filter($"doc_id" < 30 && size(split($"text", " ")) >= 30)
      .select($"doc_id", size(split($"text", " ")).as("nt"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(expect.nonEmpty, "no plantable docs — span test vacuous")
    val spans = rows("q_dedup_span")
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    expect.foreach { case (d, nt) =>
      // the (orig, orig+870000) pair merges its ~nt shared windows into
      // EXACTLY one diagonal-aligned island covering the whole original
      val hits = spans.filter(s => s._1 == d && s._2 == d + 870000L &&
        s._4 - s._3 == 3L)
      assert(hits.length == 1,
        s"pair ($d, ${d + 870000L}): ${hits.length} diag-3 spans, want 1")
      assert(hits.head == ((d, d + 870000L, 0L, 3L, nt.toLong)),
        s"pair ($d): got ${hits.head}, want full span of $nt tokens")
    }
    // every reported span is at least one window long and starts in-doc
    spans.foreach { s =>
      assert(s._5 >= 20L && s._3 >= 0L && s._4 >= 0L, s"bad span $s")
    }
  }

  test("q_neardup_incr: exact batch copies always caught, prefix copies near-1") {
    val r = rows("q_neardup_incr")
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    // 40 exact copies (+850000) share all 16 minhashes -> every one MUST
    // pair with its source at jaccard exactly 1.0
    val exact = r.filter(x => x._1 >= 850000L && x._1 < 860000L &&
      x._2 == x._1 - 850000L)
    assert(exact.length == 40, s"${exact.length} of 40 exact copies caught")
    exact.foreach(x => assert(x._3 == 1.0, s"exact copy $x not jaccard 1"))
    // one-token-prefix copies (+860000): jaccard = n/(n+1) -> high but
    // < 1; banding is deterministic yet not guaranteed per doc, so a
    // coverage bound, not identity
    val near = r.filter(x => x._1 >= 860000L && x._2 == x._1 - 860000L)
    assert(near.length >= 18, s"only ${near.length} of 20 near copies caught")
    near.foreach(x => assert(x._3 >= 0.8 && x._3 < 1.0,
      s"near copy $x outside (0.8, 1)"))
    // the batch never pairs with itself and the corpus never re-pairs:
    // every row is batch-id x corpus-id
    r.foreach { x =>
      assert(x._1 >= 850000L, s"non-batch left id in $x")
      assert(x._2 < 850000L, s"non-corpus right id in $x")
    }
  }

  test("q_decontam_excise: token accounting exact, full copies excise to empty") {
    val r = rows("q_decontam_excise").map(x =>
      (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getString(4)))
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x._3 + x._4 == x._2, s"accounting broken: $x")
      val keptToks = if (x._5.isEmpty) 0 else x._5.split(" ").length
      assert(keptToks == x._4,
        s"doc ${x._1}: clean_text has $keptToks tokens, n_kept ${x._4}")
    }
    // planted verbatim benchmark copies (+1000000) are FULLY contaminated:
    // everything excised, clean_text empty
    val plants = r.filter(_._1 >= 1000000L)
    assert(plants.nonEmpty, "no planted copies in output")
    plants.foreach { x =>
      assert(x._4 == 0L && x._5.isEmpty, s"plant ${x._1} not fully excised")
    }
    // at least one organic doc is PARTIALLY contaminated (cut, not drop)
    assert(r.exists(x => x._1 < 1000000L && x._4 > 0L && x._3 > 0L),
      "no partial excision exercised")
  }

  test("q_dedup_excise: planted clones keep exactly their 3-token junk prefix") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val planted = graft.engine.Tables.documents(spark, sf)
      .filter($"doc_id" < 30 && size(split($"text", " ")) >= 30)
      .select($"doc_id", size(split($"text", " ")).as("nt"))
      .collect().map(x => (x.getLong(0) + 870000L) -> x.getInt(1)).toMap
    assert(planted.nonEmpty)
    val r = rows("q_dedup_excise").map(x =>
      (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getString(4))).toSeq
    r.foreach(x => assert(x._3 + x._4 == x._2, s"accounting broken: $x"))
    val byId = r.map(x => x._1 -> x).toMap
    var prefixSurvivors = 0
    planted.foreach { case (cloneId, nt) =>
      val row = byId.get(cloneId)
      assert(row.isDefined, s"clone $cloneId not excised at all")
      val x = row.get
      // the clone's whole copied body (nt tokens) is always cut; the
      // junk prefix survives UNLESS the clone's source is itself an
      // organic duplicate (then a clone-vs-clone pair covers the prefix
      // too) — so the survivor is exactly the prefix or nothing
      assert(x._2 == nt + 3L && x._3 >= nt.toLong,
        s"clone $cloneId: got $x, want >= $nt of ${nt + 3} removed")
      assert((x._4 == 3L && x._5 == "qz qx qv") ||
        (x._4 == 0L && x._5.isEmpty),
        s"clone $cloneId survivor must be the prefix or empty: $x")
      if (x._4 == 3L) prefixSurvivors += 1
    }
    assert(prefixSurvivors > 0, "no clone kept its prefix — excision " +
      "should cut the body only for unique-source clones")
  }

  test("q_anneal_plan: junk source excluded from anneal, budgets conserved") {
    val r = rows("q_anneal_plan").map(x =>
      (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7),
        x.getDouble(8)))
    val junk = r.filter(_._1 == "junkweb")
    assert(junk.length == 1, "planted junkweb source missing")
    // all-junk docs fail the letter/stopword rules -> rate 0, no anneal
    assert(junk.head._4 == 0.0 && junk.head._5 == 0L &&
      junk.head._7 == 0L, s"junkweb not excluded: ${junk.head}")
    // at least one organic source clears the 0.7 bar and gets phase-2
    val eligible = r.filter(_._5 == 1L)
    assert(eligible.nonEmpty, "no anneal-eligible source — bar vacuous")
    eligible.foreach(x => assert(x._7 > 0L, s"eligible with no p2: $x"))
    // budget conservation up to half-ulp per source
    val p1 = r.map(_._6).sum; val p2 = r.map(_._7).sum
    assert(math.abs(p1 - 900000L) <= r.length, s"phase-1 budget $p1")
    assert(math.abs(p2 - 100000L) <= eligible.length, s"phase-2 budget $p2")
    // the anneal upweights exactly the eligible sources
    r.foreach { x =>
      if (x._5 == 1L) assert(x._9 > 1.0, s"eligible not boosted: $x")
      else assert(x._9 == 0.0, s"ineligible boosted: $x")
    }
  }

  test("q_winnowing: planted prefix clones always share fingerprints") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val planted = graft.engine.Tables.documents(spark, sf)
      .filter($"doc_id" < 25 && size(split($"text", " ")) >= 30)
      .select($"doc_id").as[Long].collect().toSet
    assert(planted.nonEmpty)
    val r = rows("q_winnowing")
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // winnowing guarantee: a >= 6-token shared run shares a selected
    // hash; the clones share their ENTIRE >= 30-token body, so every
    // (orig, orig+880000) pair clears the 3-fingerprint bar
    planted.foreach { d =>
      val hit = r.find(x => x._1 == d && x._2 == d + 880000L)
      assert(hit.isDefined, s"clone pair ($d, ${d + 880000L}) missed")
      assert(hit.get._3 >= 3L, s"pair $d shares only ${hit.get._3}")
    }
  }

  test("q_quality_ablate: long-word plants are wordlen-ONLY failures") {
    val r = rows("q_quality_ablate").map(x =>
      x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r.keySet == Set("alpha", "stopword", "symbol", "wordcount",
      "wordlen"))
    // the 10 planted 34-char-word docs fail wordlen and nothing else
    val (_, wlFail, wlOnly) = r("wordlen")
    assert(wlFail >= 10 && wlOnly >= 10,
      s"wordlen fail=$wlFail only=$wlOnly, want >= 10 from plants")
    // the all-digit junk plants fail alpha AND stopword -> they appear
    // in both totals but in NEITHER only-count
    assert(r("alpha")._2 >= 10 && r("stopword")._2 >= 10)
    r.foreach { case (n, (nd, f, o)) =>
      assert(o <= f && f <= nd, s"$n accounting broken: $f/$o/$nd")
    }
  }

  test("q_mrl_recall: d=64 identity row reads exactly 1.0, grid complete") {
    val r = rows("q_mrl_recall").map(x =>
      (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
    assert(r.length == 15, s"${r.length} rows, want 5 probes x 3 dims")
    r.filter(_._2 == 64).foreach { x =>
      assert(x._3 == 10L && x._4 == 1.0, s"d=64 identity broken: $x")
    }
    r.foreach { x =>
      assert(x._3 >= 0L && x._3 <= 10L)
      assert(math.abs(x._4 - x._3.toDouble / 10.0) < 1e-9)
    }
  }

  test("q_dedup_cdc: prefix-edited clones re-sync; aligned chunking cannot") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Every planted prefix-edited clone (id+430000, 'zq zr ' + text) must
    // pair with its original: CDC boundaries re-synchronize right after
    // the 2-token insertion. Restrict to originals long enough to have
    // >= 2 eligible (>= 5-token) chunks — the declared filter.
    val pairs = rows("q_dedup_cdc")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = pairs.filter { case (a, b) => b == a + 430000L }
    assert(planted.size >= 10,
      s"only ${planted.size} planted CDC pairs surfaced: ${pairs.take(5)}")
    // The defining CDC property: on the SAME prefix-edited plants,
    // ALIGNED 20-token chunking shares ZERO chunk digests (every chunk
    // shifts by 2 tokens), while CDC shares >= 2 (it paired above).
    val base = graft.engine.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val docs = base.unionByName(
      base.filter($"doc_id" < 25)
        .select(($"doc_id" + 430000L).as("doc_id"),
          concat(lit("zq zr "), $"text").as("text")))
    val aligned = docs
      .select($"doc_id", split($"text", " ").as("l"))
      .select($"doc_id", posexplode(expr(
        "transform(sequence(0, cast(ceil(size(l) / 20.0) as int) - 1), " +
          "i -> concat_ws(' ', slice(l, i * 20 + 1, 20)))")))
      .toDF("doc_id", "pos", "chunk")
      .select($"doc_id", md5($"chunk").as("ch"))
    val alignedPairs = aligned.as("x").join(aligned.as("y"),
        col("x.ch") === col("y.ch") &&
          col("y.doc_id") === col("x.doc_id") + 430000L)
      .select(col("x.doc_id")).distinct().count()
    assert(alignedPairs == 0L,
      s"aligned chunking unexpectedly matched $alignedPairs plant docs")
  }

  test("q_bpe_merge: merges learned, applied, and accounting is exact") {
    val r = rows("q_bpe_merge")
    assert(r.length >= 10, s"only ${r.length} sources")
    val merges = r.map(x =>
      (x.getString(1), x.getString(2), x.getString(3), x.getString(4)))
      .distinct
    assert(merges.length == 1, "merge list must be corpus-global")
    val (m1, m2, m3, m4) = merges.head
    assert(Seq(m1, m2, m3, m4).forall(m => m != null && m.contains(" ")),
      s"bad merge list: $m1 | $m2 | $m3 | $m4")
    assert(Seq(m1, m2, m3, m4).distinct.length == 4)
    var occ = 0L
    r.foreach { x =>
      val (tb, ta, mo) = (x.getLong(6), x.getLong(7), x.getLong(8))
      assert(mo == tb - ta && mo >= 0L && ta >= 1L)
      occ += mo
    }
    assert(occ > 0L, "no merge ever fired — vacuous")
  }

  test("bpe replace chain: left-to-right non-overlap on a run doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the exact expression shape the query uses: ' a a a a a ' under
    // merge 'a a' -> left-to-right non-overlapping scan; the first match
    // consumes the separating space, so the next hit is the SPACE-led
    // occurrence one token later: 'a_a a a_a' (5 tokens -> 3). DuckDB's
    // replace was probed to return exactly this string — the contract
    // both oracles rely on.
    val out = Seq("a a a a a").toDF("text")
      .select(expr(
        "trim(replace(concat(' ', text, ' '), ' a a ', ' a_a '))"))
      .collect()(0).getString(0)
    assert(out == "a_a a a_a", s"got '$out'")
  }
}
