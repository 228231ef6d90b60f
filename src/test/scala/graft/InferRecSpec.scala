package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Registry, Tables}

/** Semantic invariants + plan pins for the round-8 session-2 surface:
  * inferential statistics (InferOps), market-basket (RecOps), trend/SAX
  * (SeriesOps), LPA communities (GraphOps), the minhash calibration
  * audit (ScaleOps), and the ORC/XML roundtrip sources (Formats).
  */
class InferRecSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = Registry.byName(name).run(spark, sf)

  test("new queries never degrade to a cartesian product") {
    for (q <- Seq("q_ttest", "q_anova", "q_cramers_v", "q_assoc_rules",
        "q_itemsim", "q_trend", "q_sax", "q_lpa", "q_minhash_acc")) {
      val p = run(q).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("q_ttest statistic is finite and df is in the Welch range") {
    val r = run("q_ttest").head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val df = r.getAs[Double]("df_welch")
    assert(n1 > 1 && n2 > 1)
    assert(!r.getAs[Double]("t_stat").isNaN)
    // Welch df is bounded by [min(n1,n2)-1, n1+n2-2]
    assert(df >= math.min(n1, n2) - 1.0 && df <= (n1 + n2 - 2).toDouble,
      s"df=$df outside [${math.min(n1, n2) - 1}, ${n1 + n2 - 2}]")
  }

  test("q_anova decomposes total sum of squares exactly") {
    val r = run("q_anova").head
    val ssb = r.getAs[Double]("ss_between")
    val ssw = r.getAs[Double]("ss_within")
    assert(ssb >= 0 && ssw > 0)
    // recompute total SS directly from the raw column
    val st = Tables.documents(spark, sf)
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("n_chars")).cast("double").as("s"),
        sum(col("n_chars") * col("n_chars")).cast("double").as("q")).head
    val sst = st.getAs[Double]("q") -
      st.getAs[Double]("s") * st.getAs[Double]("s") / st.getAs[Double]("n")
    assert(math.abs(ssb + ssw - sst) < 1e-2,
      s"SSB+SSW=${ssb + ssw} vs SST=$sst")
    assert(r.getAs[Double]("f_stat") >= 0)
  }

  test("q_cramers_v is a valid effect size in [0,1]") {
    val r = run("q_cramers_v").head
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0, s"V=$v")
    assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("q_assoc_rules probabilities are coherent") {
    val rows = run("q_assoc_rules").collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      val sup = r.getAs[Double]("support")
      val conf = r.getAs[Double]("confidence")
      assert(r.getAs[String]("antecedent") != r.getAs[String]("consequent"))
      assert(sup > 0 && sup <= 1.0 + 1e-9)
      // P(a∧b) <= P(b|a); both rounded at 6dp
      assert(conf >= sup - 1e-6, s"conf=$conf < support=$sup")
      assert(r.getAs[Double]("lift") > 0)
    }
  }

  test("q_itemsim emits at most 3 neighbors per brand with valid cosines") {
    val rows = run("q_itemsim").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("brand")).foreach { case (b, rs) =>
      assert(rs.length <= 3, s"$b has ${rs.length} neighbors")
      assert(rs.map(_.getAs[Int]("rk")).sorted.sameElements(1 to rs.length))
    }
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c > 0 && c <= 1.0 + 1e-9, s"cosine=$c")
    }
  }

  test("q_trend fits are well-formed (r2 in [0,1], one row per type)") {
    val rows = run("q_trend").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("event_type")).distinct.length ==
      rows.length)
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9,
        s"${r.getAs[String]("event_type")}: r2=$r2")
      assert(r.getAs[Int]("n_days") <= 40) // events span ~30 days
    }
  }

  test("q_sax words are 3-letter a-d motifs whose shares sum to 1") {
    val rows = run("q_sax").collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[String]("word").matches("[abcd]{3}"),
        r.getAs[String]("word")))
    val tot = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(tot - 1.0) < 1e-3, s"share sum=$tot")
  }

  test("q_lpa communities partition the co-purchase vertex set") {
    val rows = run("q_lpa").collect()
    assert(rows.nonEmpty)
    // independent vertex count from the same graph restriction
    val op = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey") && col("p_size") <= 10)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nverts = op.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(explode(col("ps")).as("v")).distinct().count()
    val total = rows.map(_.getAs[Int]("n_members").toLong).sum
    assert(total == nverts, s"members=$total vs verts=$nverts")
    // propagation actually merged communities (fewer labels than nodes)
    assert(rows.length < nverts)
  }

  test("q_minhash_acc error bound matches 16-hash binomial noise") {
    val r = run("q_minhash_acc").head
    assert(r.getAs[Int]("n_pairs") > 0)
    val est = r.getAs[Double]("mean_est")
    val exact = r.getAs[Double]("mean_exact")
    assert(est >= 0 && est <= 1 && exact >= 0 && exact <= 1)
    // std err of a 16-trial proportion is <= 0.125; mean |err| over
    // band-selected (high-J) pairs stays well inside 2x that
    assert(r.getAs[Double]("mean_abs_err") <= 0.25,
      s"mean_abs_err=${r.getAs[Double]("mean_abs_err")}")
  }

  test("q_hits authorities form a probability distribution after round 2") {
    val rows = run("q_hits").collect()
    assert(rows.nonEmpty)
    // authority_pm is the L1-normalized score x1000 — sums to ~1000
    val tot = rows.map(_.getAs[Double]("authority_pm")).sum
    assert(math.abs(tot - 1000.0) < 1.0, s"sum=$tot")
    rows.foreach(r => assert(r.getAs[Double]("authority_pm") >= 0))
  }

  test("q_assortativity is a correlation coefficient in [-1,1]") {
    val r = run("q_assortativity").head
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"r=$a")
    assert(r.getAs[Int]("n_edges") > 0)
  }

  test("q_modularity is bounded and counts match q_lpa") {
    val m = run("q_modularity").head
    val q = m.getAs[Double]("modularity")
    // modularity of any partition lies in [-0.5, 1)
    assert(q >= -0.5 - 1e-9 && q < 1.0, s"Q=$q")
    assert(m.getAs[Int]("n_communities") ==
      run("q_lpa").count().toInt,
      "modularity and LPA disagree on the community count")
  }

  test("q_path_top paths are nonempty ordered event-type chains") {
    val rows = run("q_path_top").collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { r =>
      val p = r.getAs[String]("path")
      assert(p.split(">").forall(types.contains), p)
      assert(r.getAs[Long]("n_sessions") > 0)
    }
    // ranking is by frequency
    val ns = rows.map(_.getAs[Long]("n_sessions"))
    assert(ns.sameElements(ns.sorted.reverse))
  }

  test("q_psi is nonnegative (terms share sign) with full half-counts") {
    val rows = run("q_psi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // (p-q) and ln(p/q) always share sign, so PSI >= 0
      assert(r.getAs[Double]("psi") >= -1e-9,
        s"${r.getAs[String]("event_type")}: ${r.getAs[Double]("psi")}")
      assert(r.getAs[Long]("n_first") > 0 && r.getAs[Long]("n_second") > 0)
    }
  }

  test("q_target_encode shrinks every category toward the global mean") {
    val rows = run("q_target_encode").collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_orders")).sum.toDouble
    val global = rows.map(r =>
      r.getAs[Double]("raw_mean") * r.getAs[Long]("n_orders")).sum / n
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_mean")
      val enc = r.getAs[Double]("encoded")
      val lo = math.min(raw, global) - 0.05
      val hi = math.max(raw, global) + 0.05
      assert(enc >= lo && enc <= hi,
        s"${r.getAs[String]("o_orderpriority")}: enc=$enc outside [$lo,$hi]")
    }
  }

  test("q_backtest_snaive scores are valid error metrics") {
    val rows = run("q_backtest_snaive").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_scored") >= 1)
      assert(r.getAs[Double]("mape") >= 0)
      assert(r.getAs[Double]("rmse") >= 0)
    }
  }

  test("q_knn_classify votes are coherent per probe") {
    val rows = run("q_knn_classify").collect()
    assert(rows.length == 25, s"expected 25 probes, got ${rows.length}")
    rows.foreach { r =>
      val v = r.getAs[Int]("n_votes")
      assert(v >= 1 && v <= 5, s"votes=$v")
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[Int]("predicted") == r.getAs[Int]("true_label")))
    }
  }

  test("q_spearman is a correlation in [-1,1]") {
    val r = run("q_spearman").head
    val rho = r.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, s"rho=$rho")
    assert(r.getAs[Int]("n_users") > 1)
  }

  test("q_jackknife SE is positive and the mean is within source extremes") {
    val r = run("q_jackknife").head
    assert(r.getAs[Double]("jackknife_se") > 0)
    val ext = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg((sum(col("n_chars")) / count(lit(1))).as("m"))
      .agg(min(col("m")).as("lo"), max(col("m")).as("hi")).head
    val mean = r.getAs[Double]("mean_chars")
    assert(mean >= ext.getAs[Double]("lo") && mean <= ext.getAs[Double]("hi"))
  }

  test("q_theil indices are nonnegative per nation") {
    val rows = run("q_theil").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("theil_t") >= -1e-9,
        s"${r.getAs[String]("n_name")}: ${r.getAs[Double]("theil_t")}")
      assert(r.getAs[Int]("n_customers") > 0)
    }
  }

  test("q_event_collapse bursts never exceed events and cover them all") {
    val rows = run("q_event_collapse").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bursts") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Double]("events_per_burst") >= 1.0 - 1e-9)
    }
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("q_variant extraction agrees with the fixed-schema JSON path") {
    // variant_get('$.k') must see exactly what from_json(map) sees
    val v = run("q_variant").select(col("event_type"), col("sum_k")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("sum_k")).toMap
    val j = run("q_fn_json").select(col("event_type"), col("sum_k")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("sum_k")).toMap
    assert(v == j, s"variant=$v json=$j")
  }

  test("q_fn_hof lambda counts are internally consistent") {
    val rows = run("q_fn_hof").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("long_tokens") <= r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("token_chars") > r.getAs[Long]("total_tokens"))
    }
  }

  test("q_win_ntile quartiles are balanced and ordered") {
    val rows = run("q_win_ntile").collect()
    assert(rows.length == 4)
    val sizes = rows.map(_.getAs[Long]("n_customers"))
    assert(sizes.max - sizes.min <= 1, s"unbalanced: ${sizes.toSeq}")
    // quartile value ranges must be non-overlapping and increasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_cents") <= b.getAs[Long]("min_cents"))
    }
  }

  test("q_burstiness index lies in (-1, 1)") {
    val rows = run("q_burstiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Double]("burstiness")
      assert(b > -1.0 && b < 1.0, s"${r.getAs[String]("event_type")}: $b")
      assert(r.getAs[Double]("cv") >= 0)
    }
  }

  test("q_curriculum stages are monotone in difficulty and cover the corpus") {
    val rows = run("q_curriculum").collect()
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_score") <= b.getAs[Long]("min_score") ||
        a.getAs[Long]("max_score") == b.getAs[Long]("min_score"),
        "stage score ranges out of order")
      assert(a.getAs[Int]("stage") < b.getAs[Int]("stage"))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
  }

  test("q_quantile_map percentiles average to ~0.5 corpus-wide") {
    val rows = run("q_quantile_map").collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val grand = rows.map(r =>
      r.getAs[Double]("mean_pctl") * r.getAs[Long]("n_docs")).sum / n
    // mean of cume_dist over all rows is (n+1)/2n -> ~0.5
    assert(math.abs(grand - 0.5) < 0.01, s"grand mean pctl=$grand")
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_pctl")
      assert(m > 0 && m < 1)
    }
  }

  test("q_wow_growth first week has null growth, revenue always positive") {
    val rows = run("q_wow_growth").orderBy(col("week_idx")).collect()
    assert(rows.length > 10)
    assert(rows.head.isNullAt(rows.head.fieldIndex("wow_growth")))
    val gi = rows.head.fieldIndex("wow_growth")
    assert(rows.tail.count(!_.isNullAt(gi)) > 10,
      "consecutive weeks should have growth values")
    rows.foreach(r => assert(r.getAs[Double]("revenue") > 0))
  }

  test("q_2hop reach excludes self and direct neighbors") {
    val rows = run("q_2hop").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("degree") >= 1)
      assert(r.getAs[Int]("n_2hop") >= 0)
    }
    // on a connected-ish graph someone must have strict 2-hop reach
    assert(rows.exists(_.getAs[Int]("n_2hop") > 0))
  }

  test("q_heaps vocabulary growth is monotone and sub-linear") {
    val rows = run("q_heaps").orderBy(col("decile")).collect()
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("cum_tokens") < b.getAs[Long]("cum_tokens"))
      assert(a.getAs[Long]("vocab") <= b.getAs[Long]("vocab"))
      // sub-linear growth: type-token ratio is non-increasing
      assert(a.getAs[Double]("type_token_ratio") >=
        b.getAs[Double]("type_token_ratio") - 1e-9)
    }
  }

  test("q_weighted_median splits revenue mass at the reported quantity") {
    val rows = run("q_weighted_median").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val med = r.getAs[Double]("weighted_median_qty")
      val li = Tables.lineitem(spark, sf).filter(col("l_returnflag") === flag)
      val below = li.filter(col("l_quantity") <= med)
        .agg(sum(col("l_extendedprice"))).head.getDouble(0)
      val total = li.agg(sum(col("l_extendedprice"))).head.getDouble(0)
      assert(below >= total / 2 * 0.999,
        s"$flag: mass below median = ${below / total}")
    }
  }

  test("q_clustering_coef is consistent with q_triangles") {
    val r = run("q_clustering_coef").head
    val c = r.getAs[Double]("clustering_coef")
    assert(c > 0 && c <= 1.0 + 1e-9, s"C=$c")
    // the oriented triple-join in q_triangles emits each triangle once
    assert(r.getAs[Long]("n_triangles") == run("q_triangles").count(),
      "triangle counts disagree between the two queries")
    assert(r.getAs[Long]("n_wedges") >= r.getAs[Long]("n_triangles") * 3)
  }

  test("q_agg_mode picks the true per-group maximum frequency") {
    val rows = run("q_agg_mode").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val maxN = Tables.lineitem(spark, sf)
        .filter(col("l_returnflag") === flag)
        .groupBy(col("l_quantity")).count()
        .agg(max(col("count"))).head.getLong(0)
      assert(r.getAs[Long]("n_occurrences") == maxN, flag)
    }
  }

  test("q_corr_matrix values are correlations with the expected signs") {
    val rows = run("q_corr_matrix").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9,
        s"${r.getAs[String]("var_a")}~${r.getAs[String]("var_b")}: $c")
    }
    // all 6 unordered pairs exactly once
    assert(rows.map(r => (r.getAs[String]("var_a"),
      r.getAs[String]("var_b"))).distinct.length == 6)
    // cross-check one cell against Spark's own corr() (float tolerance;
    // the query's decimal staging differs from corr()'s streaming form)
    val qp = rows.find(r => r.getAs[String]("var_a") == "qty" &&
      r.getAs[String]("var_b") == "price").get.getAs[Double]("corr")
    val ref = Tables.lineitem(spark, sf)
      .agg(corr(col("l_quantity"), col("l_extendedprice"))).head.getDouble(0)
    assert(math.abs(qp - ref) < 1e-4, s"query=$qp corr()=$ref")
  }

  test("q_dedup_incr catches every planted incoming duplicate") {
    val rows = run("q_dedup_incr").collect()
    assert(rows.nonEmpty)
    // each planted batch doc (id+2000000, identical text) must match its
    // own corpus source with Jaccard 1.0
    val planted = rows.filter(_.getAs[Long]("batch_id") >= 2000000L)
    assert(planted.nonEmpty, "planted duplicates not detected")
    val selfMatched = planted.filter(r =>
      r.getAs[Long]("batch_id") - 2000000L == r.getAs[Long]("corpus_id"))
    assert(selfMatched.length >= 35, // 40 planted; tiny docs (<3 grams) exempt
      s"only ${selfMatched.length} planted docs matched their source")
    selfMatched.foreach(r =>
      assert(r.getAs[Double]("jaccard") == 1.0, r.toString))
    val p = run("q_dedup_incr").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
  }

  test("q_prf metrics reconcile with the confusion matrix") {
    val rows = run("q_prf").collect()
    assert(rows.nonEmpty)
    val total = run("q_lang_confusion")
      .agg(sum(col("n_docs"))).head.getLong(0)
    // every true doc appears in exactly one class row
    assert(rows.map(_.getAs[Long]("n_true")).sum == total)
    rows.foreach { r =>
      val tp = r.getAs[Long]("tp")
      assert(tp <= r.getAs[Long]("n_true") && tp <= r.getAs[Long]("n_pred"))
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0 && rec <= 1.0 + 1e-9)
      if (!r.isNullAt(r.fieldIndex("f1"))) {
        val f1 = r.getAs[Double]("f1")
        val p = r.getAs[Double]("precision")
        // F1 is the harmonic mean: bounded by min and max of (p, rec)
        assert(f1 <= math.max(p, rec) + 1e-6 &&
          f1 >= math.min(p, rec) - 1e-6, s"$r")
      }
    }
  }

  test("q_not_in_null exhibits the three-valued-logic divergence") {
    val r = run("q_not_in_null").head
    // the subquery always contains NULLs -> NOT IN filters everything
    assert(r.getAs[Long]("n_not_in") == 0L)
    // NOT EXISTS ignores NULLs -> the intuitive complement is nonzero
    assert(r.getAs[Long]("n_not_exists") >= 0L)
    assert(r.getAs[Long]("n_not_exists") <=
      Tables.customer(spark, sf).count())
  }

  test("q_union_evolve pads exactly the missing generation columns") {
    val rows = run("q_union_evolve").collect()
    assert(rows.nonEmpty)
    val nulls = rows.map(r =>
      (r.getAs[Long]("null_text"), r.getAs[Long]("null_source"),
        r.getAs[Long]("n_rows"))).toSeq
    // every row is missing exactly one generation's columns
    nulls.foreach { case (nt, ns, n) => assert(nt + ns == n, s"$nt+$ns!=$n") }
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      Tables.documents(spark, sf).count())
  }

  test("q_abc classes partition the revenue with the 80/95 structure") {
    val rows = run("q_abc").collect()
    assert(rows.map(_.getAs[String]("cls")).toSet.subsetOf(Set("A", "B", "C")))
    val shares = rows.map(r =>
      r.getAs[String]("cls") -> r.getAs[Double]("share")).toMap
    assert(math.abs(shares.values.sum - 1.0) < 1e-3)
    // A holds at most 80% of revenue by construction; C the tail
    assert(shares.getOrElse("A", 0.0) <= 0.80 + 1e-6)
    // A has fewer parts than C on a concentrated distribution? not
    // guaranteed on uniform data - assert the cumulative structure only
    val n = rows.map(_.getAs[Long]("n_parts")).sum
    assert(n == Tables.lineitem(spark, sf)
      .select(col("l_partkey")).distinct().count())
  }

  test("q_new_vs_returning: day one is all-new, totals reconcile") {
    val rows = run("q_new_vs_returning").orderBy(col("day")).collect()
    assert(rows.nonEmpty)
    val first = rows.head
    assert(first.getAs[Long]("n_new") == first.getAs[Long]("n_active"),
      "every user on the first day is new")
    assert(math.abs(first.getAs[Double]("new_share") - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_returning") ==
        r.getAs[Long]("n_active"))
    }
    // total new users across days == distinct users
    assert(rows.map(_.getAs[Long]("n_new")).sum ==
      Tables.events(spark, sf).select(col("user_id")).distinct().count())
  }

  test("q_entropy_rate is bounded by the uniform-chain maximum") {
    val r = run("q_entropy_rate").head
    val h = r.getAs[Double]("entropy_rate_nats")
    val states = run("q_markov").count().toDouble
    assert(h >= 0 && h <= math.log(states) + 1e-6,
      s"H=$h vs ln($states)=${math.log(states)}")
  }

  test("ORC and XML roundtrips preserve the source tables exactly") {
    val orc = run("q_source_orc").collect()
    val direct = Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("text_chars"),
        sum(col("n_chars")).as("meta_chars"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang")).collect()
    assert(orc.map(_.toString).sameElements(direct.map(_.toString)))

    val xml = run("q_source_xml").collect()
    assert(xml.nonEmpty)
    val nOrders = xml.map(_.getAs[Long]("n_orders")).sum
    assert(nOrders == Tables.orders(spark, sf).count())
  }
}
