package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{HashingTF, IDF, StandardScaler, Tokenizer}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.tuning.ParamGridBuilder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml._

class MlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private lazy val embFeatures = {
    import spark.implicits._
    graft.engine.Tables.embeddings(spark, sf)
      .select(
        array_to_vector(expr("transform(embedding, x -> cast(x as double))"))
          .as("features"),
        $"label".cast("double").as("label"))
      .cache()
  }

  test("GridSearchCV survives a session with an initialized ObservationManager") {
    import spark.implicits._
    // Force-initialize the session's lazy observationManager the way any
    // Gates.observed user would. Before the stripTrainingSummary fix, every
    // subsequent summary-bearing model.transform died with
    // `Task not serializable` (ObservationManager isn't Serializable), so
    // GridSearchCV only worked on observation-free sessions.
    val obs = new org.apache.spark.sql.Observation()
    spark.range(4).observe(obs, count(lit(1)).as("n")).collect()
    assert(obs.get("n") == 4L)
    val rng = new scala.util.Random(7)
    // Variant 1: bare LR — the model itself is HasTrainingSummary.
    val pts = (1 to 120).map { _ =>
      val cls = rng.nextInt(2)
      (Array(cls * 4.0 - 2.0 + rng.nextGaussian() * 0.4), cls.toDouble)
    }.toDF("arr", "label")
      .select(array_to_vector($"arr").as("features"), $"label")
    val lr = new LogisticRegression().setMaxIter(10)
    val grid = new ParamGridBuilder().addGrid(lr.regParam, Array(0.01)).build()
    val res = GridSearchCV(lr, grid,
      new MulticlassClassificationEvaluator().setMetricName("accuracy"),
      numFolds = 2, parallelism = 2).fit(pts)
    assert(res.transform(pts).columns.contains("prediction"))
    // Variant 2: composite estimator — the PipelineModel is NOT
    // HasTrainingSummary; the poisoned summary lives on the LR STAGE
    // inside it, so the strip must recurse (the round-9 red-test class).
    val txt = (1 to 120).map { i =>
      val cls = i % 2
      (if (cls == 1) s"alpha beta marker$i plantedpos" else s"alpha beta marker$i plantedneg",
        cls.toDouble)
    }.toDF("text", "label")
    val ptok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val ptf = new HashingTF().setInputCol("words").setOutputCol("tf").setNumFeatures(512)
    val pidf = new IDF().setInputCol("tf").setOutputCol("features")
    val plr = new LogisticRegression().setMaxIter(10)
    val pipe = new Pipeline().setStages(Array(ptok, ptf, pidf, plr))
    val pgrid = new ParamGridBuilder().addGrid(plr.regParam, Array(0.01)).build()
    val pres = GridSearchCV(pipe, pgrid,
      new MulticlassClassificationEvaluator().setMetricName("accuracy"),
      numFolds = 2, parallelism = 2).fit(txt)
    assert(pres.transform(txt).columns.contains("prediction"))
  }

  test("GridSearchCV picks the planted-best candidate and exposes cv_results") {
    import spark.implicits._
    // linearly separable 2-class data: light regularization must win
    val rng = new scala.util.Random(3)
    val sep = (1 to 400).map { _ =>
      val cls = rng.nextInt(2)
      val (cx, cy) = if (cls == 0) (-2.0, -2.0) else (2.0, 2.0)
      (Array(cx + rng.nextGaussian() * 0.5, cy + rng.nextGaussian() * 0.5), cls.toDouble)
    }.toDF("arr", "label")
      .select(array_to_vector($"arr").as("features"), $"label")
    val lr = new LogisticRegression().setMaxIter(20)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.001, 1000.0))
      .build()
    val res = GridSearchCV(lr, grid,
      new MulticlassClassificationEvaluator().setMetricName("accuracy"),
      numFolds = 2, parallelism = 2).fit(sep)
    assert(res.cvResults.size == 2)
    assert(res.bestScore == res.cvResults.map(_._2).max)
    assert(res.bestParams.get(lr.regParam).contains(0.001),
      s"expected regParam 0.001 best, got ${res.bestParams}: ${res.cvResults}")
    assert(res.bestScore > 0.95, s"separable data should score high: ${res.bestScore}")
    val preds = res.transform(sep)
    assert(preds.columns.contains("prediction"))
  }

  test("GridSearchCV exposes per-fold scores behind each mean (cv_results_)") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val df = (1 to 300).map { _ =>
      val cls = rng.nextInt(2)
      val c = if (cls == 0) -2.0 else 2.0
      (Array(c + rng.nextGaussian() * 0.5, c + rng.nextGaussian() * 0.5), cls.toDouble)
    }.toDF("arr", "label")
      .select(array_to_vector($"arr").as("features"), $"label")
    val lr = new LogisticRegression().setMaxIter(10)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 10.0)).build()
    val res = GridSearchCV(lr, grid,
      new MulticlassClassificationEvaluator().setMetricName("accuracy"),
      numFolds = 3, parallelism = 2).fit(df)
    assert(res.foldMetrics.size == 2, "one per-fold entry per candidate")
    res.foldMetrics.foreach { case (_, folds) =>
      assert(folds.size == 3, s"expected 3 fold scores, got $folds")
    }
    // the mean in cvResults must be the mean of the exposed fold scores
    res.cvResults.zip(res.foldMetrics).foreach { case ((pm, m), (pm2, fs)) =>
      assert(pm eq pm2)
      assert(math.abs(m - fs.sum / fs.size) < 1e-12)
    }
  }

  test("GridSearchCV foldCol drives the split (check_cv analog)") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    // class 0 rows get fold 0, class 1 rows get fold 1: with the custom
    // fold column each training fold sees ONE class only, so held-out
    // accuracy collapses — proof the column, not the seed, split the data
    val df = (1 to 200).map { _ =>
      val cls = rng.nextInt(2)
      val c = if (cls == 0) -2.0 else 2.0
      (Array(c + rng.nextGaussian() * 0.3), cls.toDouble, cls)
    }.toDF("arr", "label", "myfold")
      .select(array_to_vector($"arr").as("features"), $"label", $"myfold")
    val lr = new LogisticRegression().setMaxIter(10)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01)).build()
    val ev = new MulticlassClassificationEvaluator().setMetricName("accuracy")
    val random = GridSearchCV(lr, grid, ev, numFolds = 2).fit(df.drop("myfold"))
    val custom = GridSearchCV(lr, grid, ev, numFolds = 2,
      foldCol = Some("myfold")).fit(df)
    assert(random.bestScore > 0.9, s"random folds: ${random.bestScore}")
    assert(custom.bestScore < 0.5,
      s"single-class training folds must collapse accuracy: ${custom.bestScore}")
  }

  test("RandomizedSearchCV samples deterministically and respects nIter") {
    val lr = new LogisticRegression().setMaxIter(5)
    val dists: Seq[(org.apache.spark.ml.param.Param[Any], ParamDist[Any])] = Seq(
      (lr.regParam.asInstanceOf[org.apache.spark.ml.param.Param[Any]],
        ParamDist.LogUniform(1e-4, 1.0).asInstanceOf[ParamDist[Any]]),
      (lr.elasticNetParam.asInstanceOf[org.apache.spark.ml.param.Param[Any]],
        ParamDist.Choice(Seq(0.0, 0.5)).asInstanceOf[ParamDist[Any]]))
    val rs = RandomizedSearchCV(lr, dists, nIter = 4,
      new MulticlassClassificationEvaluator().setMetricName("accuracy"),
      numFolds = 2, parallelism = 2, seed = 7L)
    val g1 = rs.sampleGrid(); val g2 = rs.sampleGrid()
    assert(g1.length == 4)
    assert(g1.map(_.toString).toSeq == g2.map(_.toString).toSeq,
      "seeded sampling must be deterministic")
    val regs = g1.map(pm => pm.get(lr.regParam).get)
    assert(regs.forall(r => r >= 1e-4 && r <= 1.0))
    assert(regs.distinct.length > 1, "degenerate sampling")
  }

  test("KeyedModels.fitLinear recovers planted per-key coefficients") {
    import spark.implicits._
    val rng = new scala.util.Random(1)
    val rows = (for {
      (key, (a, b, c)) <- Seq("k1" -> (2.0, -1.0, 3.0), "k2" -> (-0.5, 4.0, 1.0))
      _ <- 1 to 200
    } yield {
      val x1 = rng.nextDouble() * 10; val x2 = rng.nextDouble() * 5
      (key, x1, x2, a * x1 + b * x2 + c + rng.nextGaussian() * 0.001)
    })
    val df = rows.toDF("key", "x1", "x2", "y").repartition(4)
    val models = KeyedModels.fitLinear(df, Seq("key"), Seq("x1", "x2"), "y")
    val byKey = models.collect().map(r =>
      r.getString(0) -> (r.getSeq[Double](1), r.getDouble(2), r.getLong(3))).toMap
    val (c1, i1, n1) = byKey("k1")
    assert(n1 == 200)
    assert(math.abs(c1(0) - 2.0) < 1e-2 && math.abs(c1(1) + 1.0) < 1e-2)
    assert(math.abs(i1 - 3.0) < 1e-2)
    val (c2, i2, _) = byKey("k2")
    assert(math.abs(c2(0) + 0.5) < 1e-2 && math.abs(c2(1) - 4.0) < 1e-2)
    assert(math.abs(i2 - 1.0) < 1e-2)
  }

  test("fitRidge: lambda=0 equals OLS exactly; lambda>0 shrinks; rescues singular") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 100).map { _ =>
      val x1 = rng.nextDouble() * 10
      ("k", x1, 3.0 * x1 + 1.0 + rng.nextGaussian() * 0.5)
    }
    val df = rows.toDF("key", "x1", "y").repartition(4)
    val ols = KeyedModels.fitLinear(df, Seq("key"), Seq("x1"), "y")
      .collect()(0)
    val l0 = KeyedModels.fitRidge(df, Seq("key"), Seq("x1"), "y", 0.0)
      .collect()(0)
    assert(l0.getSeq[Double](1) == ols.getSeq[Double](1) &&
      l0.getDouble(2) == ols.getDouble(2), "lambda=0 must be bit-equal to OLS")

    val shrunk = KeyedModels.fitRidge(df, Seq("key"), Seq("x1"), "y", 1e4)
      .collect()(0).getSeq[Double](1)(0)
    assert(math.abs(shrunk) < math.abs(ols.getSeq[Double](1)(0)),
      s"ridge must shrink: $shrunk vs ${ols.getSeq[Double](1)(0)}")

    // perfectly collinear features: OLS throws, ridge solves
    val sing = (1 to 50).map { i =>
      val x = i.toDouble; ("k", x, 2.0 * x, 5.0 * x + 1.0)
    }.toDF("key", "x1", "x2", "y")
    intercept[Exception] {
      KeyedModels.fitLinear(sing, Seq("key"), Seq("x1", "x2"), "y").collect()
    }
    val rescued = KeyedModels.fitRidge(sing, Seq("key"), Seq("x1", "x2"), "y", 1.0)
      .collect()(0).getSeq[Double](1)
    // collinear design splits the signal; combined slope ~ 5 via x1 + 2*x2
    assert(math.abs(rescued(0) + 2.0 * rescued(1) - 5.0) < 0.1, rescued.toString)
  }

  test("fitRidgePath: one Gram pass reproduces every per-lambda fitRidge exactly") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val rows = (for {
      key <- Seq("k1", "k2"); _ <- 1 to 150
    } yield {
      val x1 = rng.nextDouble() * 6; val x2 = rng.nextDouble() * 2
      (key, x1, x2, 1.5 * x1 - 0.5 * x2 + 2.0 + rng.nextGaussian() * 0.05)
    })
    val df = rows.toDF("key", "x1", "x2", "y").repartition(6)
    val lambdas = Seq(0.0, 0.5, 5.0)
    val path = KeyedModels
      .fitRidgePath(df, Seq("key"), Seq("x1", "x2"), "y", lambdas)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getSeq[Double](2), r.getDouble(3), r.getLong(4))).toMap
    assert(path.size == 6) // 2 keys x 3 lambdas
    lambdas.foreach { lam =>
      val single = KeyedModels
        .fitRidge(df, Seq("key"), Seq("x1", "x2"), "y", lam)
        .collect()
        .map(r => r.getString(0) -> (r.getSeq[Double](1), r.getDouble(2))).toMap
      Seq("k1", "k2").foreach { k =>
        val (pc, pi, pn) = path((k, lam))
        val (sc, si) = single(k)
        assert(pn == 150)
        // the Gram SUMS are float additions in shuffle-merge order, so two
        // separate jobs may differ in the last ulp — compare tightly, not
        // bitwise
        pc.zip(sc).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-9, s"$k lambda=$lam coef $a vs $b")
        }
        assert(math.abs(pi - si) < 1e-9, s"$k lambda=$lam intercept $pi vs $si")
      }
    }
  }

  test("selectRidge picks the lambda with the measured-best validation rmse") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val rows = (for {
      key <- Seq("k1", "k2"); i <- 1 to 240
    } yield {
      val x1 = rng.nextDouble() * 4; val x2 = rng.nextDouble() * 3
      val noise = if (key == "k1") 0.02 else 2.5 // k2 is noise-dominated
      (key, i.toLong, x1, x2, 2.0 * x1 + 1.0 * x2 + 0.5 + rng.nextGaussian() * noise)
    })
    val df = rows.toDF("key", "rid", "x1", "x2", "y").repartition(7)
    val lambdas = Seq(0.0, 1.0, 50.0)
    val best = KeyedModels.selectRidge(
      df, Seq("key"), Seq("x1", "x2"), "y", "rid", lambdas)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(r.fieldIndex("best_lambda")),
          r.getDouble(r.fieldIndex("val_rmse")))).toMap
    assert(best.keySet == Set("k1", "k2"))
    // internal consistency: recompute every (key, lambda) val rmse and
    // confirm the returned lambda is the argmin
    val bucket = pmod(xxhash64($"rid"), lit(2L))
    val train = df.filter(bucket =!= 0)
    val holdout = df.filter(bucket === 0)
    val path = KeyedModels.fitRidgePath(train, Seq("key"), Seq("x1", "x2"), "y", lambdas)
    val rmses = holdout.join(path, Seq("key"))
      .withColumn("p", $"intercept" +
        expr("aggregate(zip_with(array(cast(x1 as double), cast(x2 as double)), " +
          "coefficients, (x, c) -> x * c), 0D, (s, v) -> s + v)"))
      .groupBy($"key", $"lambda")
      .agg(sqrt(avg(($"y" - $"p") * ($"y" - $"p"))).as("rmse"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    Seq("k1", "k2").foreach { k =>
      val argmin = lambdas.minBy(l => (rmses((k, l)), l))
      assert(best(k)._1 == argmin, s"$k chose ${best(k)._1}, argmin=$argmin")
      assert(math.abs(best(k)._2 - rmses((k, argmin))) < 1e-9)
    }
    // the near-noiseless key should never need the heavy penalty
    assert(best("k1")._1 != 50.0)
  }

  test("Gram aggregation merge order does not change the fit") {
    import spark.implicits._
    val rng = new scala.util.Random(2)
    val rows = (1 to 500).map { _ =>
      val x = rng.nextDouble(); ("k", x, 5.0 * x + 2.0 + rng.nextGaussian() * 0.01)
    }
    val one = KeyedModels.fitLinear(rows.toDF("key", "x", "y").repartition(1),
      Seq("key"), Seq("x"), "y").collect()(0)
    val many = KeyedModels.fitLinear(rows.toDF("key", "x", "y").repartition(13),
      Seq("key"), Seq("x"), "y").collect()(0)
    assert(math.abs(one.getSeq[Double](1)(0) - many.getSeq[Double](1)(0)) < 1e-9)
    assert(math.abs(one.getDouble(2) - many.getDouble(2)) < 1e-9)
  }

  test("transformLinear predicts via broadcast join") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 10.0), ("a", 2.0, 20.0), ("b", 1.0, 5.0),
      ("b", 3.0, 15.0)).toDF("key", "x", "y")
    val models = KeyedModels.fitLinear(df, Seq("key"), Seq("x"), "y")
    val preds = KeyedModels.transformLinear(df, models, Seq("key"), Seq("x"))
    preds.select($"y", $"prediction").as[(Double, Double)].collect()
      .foreach { case (y, p) => assert(math.abs(y - p) < 1e-8) }
    val plan = preds.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("fitLogistic recovers planted per-key coefficients via IRLS") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))
    val planted = Map(
      "k1" -> (Array(1.5, -2.0), 0.5),
      "k2" -> (Array(-1.0, 2.5), -0.3))
    val rows = (for {
      (key, (beta, b0)) <- planted.toSeq
      _ <- 1 to 4000
    } yield {
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      val p = sigmoid(b0 + beta(0) * x1 + beta(1) * x2)
      (key, x1, x2, if (rng.nextDouble() < p) 1.0 else 0.0)
    })
    val df = rows.toDF("key", "x1", "x2", "y").repartition(8)
    val models = KeyedModels.fitLogistic(df, Seq("key"), Seq("x1", "x2"), "y")
    val byKey = models.collect().map(r =>
      r.getString(0) -> (r.getSeq[Double](1), r.getDouble(2), r.getLong(3))).toMap
    planted.foreach { case (key, (beta, b0)) =>
      val (c, i, n) = byKey(key)
      assert(n == 4000)
      assert(math.abs(c(0) - beta(0)) < 0.15, s"$key c0=${c(0)} want ${beta(0)}")
      assert(math.abs(c(1) - beta(1)) < 0.15, s"$key c1=${c(1)} want ${beta(1)}")
      assert(math.abs(i - b0) < 0.15, s"$key b0=$i want $b0")
    }
    // merge-order invariance: same fit on a different partitioning
    val models13 = KeyedModels.fitLogistic(
      rows.toDF("key", "x1", "x2", "y").repartition(13),
      Seq("key"), Seq("x1", "x2"), "y")
    val byKey13 = models13.collect().map(r =>
      r.getString(0) -> r.getSeq[Double](1)).toMap
    planted.keys.foreach { k =>
      byKey(k)._1.zip(byKey13(k)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"partitioning changed the fit: $a vs $b")
      }
    }
  }

  test("scoreLinear: near-perfect fit scores r2~1, pure-noise key scores r2~0") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows =
      (1 to 300).map { _ =>
        val x = rng.nextDouble() * 10
        ("fit", x, 2.0 * x + 1.0 + rng.nextGaussian() * 0.01)
      } ++
        (1 to 300).map { _ =>
          ("noise", rng.nextDouble() * 10, rng.nextGaussian())
        }
    val df = rows.toDF("key", "x", "y").repartition(5)
    val models = KeyedModels.fitLinear(df, Seq("key"), Seq("x"), "y")
    val scores = KeyedModels.scoreLinear(df, models, Seq("key"), Seq("x"), "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(scores("fit").getAs[Long]("n") == 300)
    assert(scores("fit").getAs[Double]("r2") > 0.999)
    assert(scores("fit").getAs[Double]("rmse") < 0.05)
    val noiseR2 = scores("noise").getAs[Double]("r2")
    assert(noiseR2 < 0.1, s"noise key should have ~0 r2, got $noiseR2")
    // zero-variance label -> null r2, not a crash
    val flat = (1 to 10).map(i => ("z", i.toDouble, 5.0)).toDF("key", "x", "y")
    val flatScore = KeyedModels.scoreLinear(
      flat, KeyedModels.fitLinear(flat, Seq("key"), Seq("x"), "y"),
      Seq("key"), Seq("x"), "y").collect()(0)
    assert(flatScore.isNullAt(flatScore.fieldIndex("r2")))
  }

  test("scoreLogistic: separable key scores accuracy 1, random key ~0.5") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows =
      (1 to 400).map { _ =>
        val x = rng.nextGaussian() * 2
        ("sep", x, if (x > 0) 1.0 else 0.0)
      } ++
        (1 to 400).map { _ =>
          ("coin", rng.nextGaussian(), if (rng.nextDouble() < 0.5) 1.0 else 0.0)
        }
    val df = rows.toDF("key", "x", "y").repartition(5)
    val models = KeyedModels.fitLogistic(df, Seq("key"), Seq("x"), "y", iters = 8)
    val scores =
      KeyedModels.scoreLogistic(df, models, Seq("key"), Seq("x"), "y")
        .collect().map(r => r.getString(0) -> r).toMap
    assert(scores("sep").getAs[Double]("accuracy") > 0.98)
    assert(scores("sep").getAs[Double]("logloss") < 0.2)
    val coinAcc = scores("coin").getAs[Double]("accuracy")
    assert(coinAcc > 0.35 && coinAcc < 0.75, s"coin accuracy $coinAcc")
    assert(scores("coin").getAs[Double]("logloss") > 0.5)
  }

  test("transformLogistic separates the classes it was fit on") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val rows = (1 to 1000).map { _ =>
      val cls = rng.nextInt(2)
      val x = (if (cls == 0) -1.5 else 1.5) + rng.nextGaussian() * 0.5
      ("k", x, cls.toDouble)
    }
    val df = rows.toDF("key", "x", "y")
    val models = KeyedModels.fitLogistic(df, Seq("key"), Seq("x"), "y", iters = 8)
    val preds = KeyedModels.transformLogistic(df, models, Seq("key"), Seq("x"))
    val acc = preds.filter($"prediction" === $"y").count().toDouble / rows.size
    assert(acc > 0.9, s"in-sample accuracy $acc")
    val plan = preds.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("singular per-key system fails loudly") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1.0, 3.0), ("a", 2.0, 2.0, 6.0),
      ("a", 3.0, 3.0, 9.0)).toDF("key", "x1", "x2", "y")
    val ex = intercept[org.apache.spark.SparkException] {
      KeyedModels.fitLinear(df, Seq("key"), Seq("x1", "x2"), "y").collect()
    }
    assert(ex.getMessage.contains("singular") ||
      ex.getCause != null && ex.getCause.getMessage.contains("singular"))
  }

  test("gapply per-group demeaning matches the window-function twin") {
    import spark.implicits._
    val ev = graft.engine.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"value")
      .as[(Long, Long, Double)]
    val viaGapply = GApply.gapply(ev)(_._2) { (uid, it) =>
      val rows = it.toSeq
      val mean = rows.map(_._3).sum / rows.size
      rows.map(r => (r._1, uid, r._3 - mean))
    }.toDF("event_id", "user_id", "demeaned")
    val viaWindow = graft.engine.Registry.byName("q_gapply_agg").run(spark, sf)
    val joined = viaGapply.as("g").join(viaWindow.as("w"), "event_id")
      .select(abs(col("g.demeaned") - col("w.demeaned")).as("err"))
      .agg(max("err")).as[Double].head()
    assert(joined < 1e-5, s"gapply vs window demeaning max err $joined")
  }

  test("pipeline: tokenizer -> hashingTF -> IDF -> scaled features fits") {
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, sf)
      .select($"doc_id", $"text", ($"lang" === "en").cast("double").as("label"))
    val pipe = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol("text").setOutputCol("words"),
      new HashingTF().setInputCol("words").setOutputCol("tf").setNumFeatures(1024),
      new IDF().setInputCol("tf").setOutputCol("tfidf"),
      new StandardScaler().setInputCol("tfidf").setOutputCol("features")))
    val model = pipe.fit(docs)
    val out = model.transform(docs)
    assert(out.count() == 500)
    assert(out.schema("features").dataType.typeName == "vector")
  }

  test("GridSearchCV tunes a text pipeline end-to-end over documents join embeddings") {
    import spark.implicits._
    // The reference's test_search parity shape (pub:
    // python/spark_sklearn/test/test_search_2.py) on this repo's own
    // fixtures: a full Tokenizer -> HashingTF -> IDF -> LogisticRegression
    // pipeline tuned by GridSearchCV over documents ⋈ embeddings.
    // Labels are PLANTED (round-1 gotcha: embeddings.label is noise):
    // even doc_ids get a marker token appended, label = parity — a
    // signal only a working text pipeline (enough hash buckets so the
    // marker's bucket is not swamped by collisions, sane
    // regularization) can recover.
    val docs = graft.engine.Tables.documents(spark, sf)
      .join(graft.engine.Tables.embeddings(spark, sf),
        $"doc_id" === $"vec_id")
      .select($"doc_id",
        concat($"text",
          when($"doc_id" % 2 === 0, lit(" xplantedmarkerx xplantedmarkerx xplantedmarkerx")).otherwise(lit("")))
          .as("text"),
        ($"doc_id" % 2 === 0).cast("double").as("label"))
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf")
    val idf = new IDF().setInputCol("tf").setOutputCol("features")
    val lr = new LogisticRegression().setMaxIter(50)
    val pipe = new Pipeline().setStages(Array(tok, tf, idf, lr))
    val grid = new ParamGridBuilder()
      .addGrid(tf.numFeatures, Array(2, 4096))
      .addGrid(lr.regParam, Array(100.0, 0.001))
      .build()
    val ev = new MulticlassClassificationEvaluator().setMetricName("accuracy")
    // planted best must win across 2 seeds AND 2 physical partitionings
    for (seed <- Seq(42L, 7L); parts <- Seq(3, 13)) {
      val res = GridSearchCV(pipe, grid, ev, numFolds = 2,
        parallelism = 2, seed = seed).fit(docs.repartition(parts))
      assert(res.bestParams.get(tf.numFeatures).contains(4096),
        s"seed=$seed parts=$parts picked numFeatures " +
          s"${res.bestParams.get(tf.numFeatures)}")
      assert(res.bestParams.get(lr.regParam).contains(0.001),
        s"seed=$seed parts=$parts picked regParam " +
          s"${res.bestParams.get(lr.regParam)}")
      // the absolute score is fold-split dependent (rand(seed) folds are
      // assigned per physical partition, and upstream layout varies with
      // suite order) — the CONTRACT is param recovery + dominance. Floor
      // backed by measurement (tools.MlFloorProbe, round 10, local[32]):
      // bestScore over this exact 2x2 matrix spanned 0.8519..0.8584; 0.8
      // leaves layout margin while still rejecting degenerate splits.
      assert(res.bestScore > 0.8,
        s"seed=$seed parts=$parts best accuracy ${res.bestScore}")
      // and the degenerate candidates really are worse, so the pick is
      // a recovery, not a tie broken by ordering
      val worst = res.cvResults.collect {
        case (pm, s) if pm.get(tf.numFeatures).contains(2) ||
          pm.get(lr.regParam).contains(100.0) => s
      }
      assert(worst.nonEmpty && worst.max < res.bestScore,
        s"seed=$seed parts=$parts degenerate candidates not dominated")
    }
  }

  test("RandomizedSearchCV tunes the text pipeline (A2 on a composite estimator)") {
    import spark.implicits._
    // same planted-marker corpus as the grid-search test; the randomized
    // sampler must (a) survive the PipelineModel strip path and (b) land
    // on the 4096-bucket candidates — the 2-bucket ones hash the marker
    // into swamped buckets and lose
    val docs = graft.engine.Tables.documents(spark, sf)
      .select($"doc_id",
        concat($"text",
          when($"doc_id" % 2 === 0, lit(" xplantedmarkerx xplantedmarkerx xplantedmarkerx")).otherwise(lit("")))
          .as("text"),
        ($"doc_id" % 2 === 0).cast("double").as("label"))
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf")
    val idf = new IDF().setInputCol("tf").setOutputCol("features")
    val lr = new LogisticRegression().setMaxIter(50)
    val pipe = new Pipeline().setStages(Array(tok, tf, idf, lr))
    val dists: Seq[(org.apache.spark.ml.param.Param[Any], ParamDist[Any])] = Seq(
      (tf.numFeatures.asInstanceOf[org.apache.spark.ml.param.Param[Any]],
        ParamDist.Choice(Seq(2, 4096)).asInstanceOf[ParamDist[Any]]),
      (lr.regParam.asInstanceOf[org.apache.spark.ml.param.Param[Any]],
        ParamDist.LogUniform(1e-4, 1e-2).asInstanceOf[ParamDist[Any]]))
    val rs = RandomizedSearchCV(pipe, dists, nIter = 4,
      new MulticlassClassificationEvaluator().setMetricName("accuracy"),
      numFolds = 2, parallelism = 2, seed = 42L)
    // seed sanity: the sampled grid must actually contain both choices
    val nfs = rs.sampleGrid().map(_.get(tf.numFeatures).get).distinct
    assert(nfs.length == 2, s"seed 42 sampled only $nfs — pick another seed")
    val res = rs.fit(docs)
    assert(res.bestParams.get(tf.numFeatures).contains(4096),
      s"picked numFeatures ${res.bestParams.get(tf.numFeatures)}")
    assert(res.bestScore > 0.8, s"best accuracy ${res.bestScore}")
  }

  test("HalvingSearchCV eliminates planted-bad candidates on cheap rungs") {
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, sf)
      .select($"doc_id",
        concat($"text",
          when($"doc_id" % 2 === 0, lit(" xplantedmarkerx xplantedmarkerx xplantedmarkerx")).otherwise(lit("")))
          .as("text"),
        ($"doc_id" % 2 === 0).cast("double").as("label"))
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf")
    val idf = new IDF().setInputCol("tf").setOutputCol("features")
    val lr = new LogisticRegression().setMaxIter(50)
    val pipe = new Pipeline().setStages(Array(tok, tf, idf, lr))
    val grid = new ParamGridBuilder()
      .addGrid(tf.numFeatures, Array(2, 4096))
      .addGrid(lr.regParam, Array(100.0, 0.001))
      .build()
    val ev = new MulticlassClassificationEvaluator().setMetricName("accuracy")
    val res = HalvingSearchCV(pipe, grid, ev, factor = 2,
      minFraction = 0.25, numFolds = 2, parallelism = 2, seed = 42L)
      .fit(docs)
    assert(res.best.bestParams.get(tf.numFeatures).contains(4096),
      s"picked ${res.best.bestParams}")
    assert(res.best.bestParams.get(lr.regParam).contains(0.001))
    assert(res.best.bestScore > 0.8, s"final score ${res.best.bestScore}")
    // trajectory shape: rung 0 scores all 4 on the quarter slice, the
    // candidate count halves per rung, the final rung runs on all data
    assert(res.rungs.head.fraction == 0.25)
    assert(res.rungs.head.scores.length == 4)
    assert(res.rungs.last.fraction == 1.0)
    assert(res.rungs.last.scores.length < 4, "final rung must be pruned")
    res.rungs.sliding(2).foreach { case Seq(a, b) =>
      assert(b.scores.length <= a.scores.length)
      assert(b.fraction >= a.fraction)
    }
    // the winner survived every rung
    res.rungs.foreach { r =>
      assert(r.scores.exists(_._1 eq res.best.bestParams) ||
        r.scores.exists(p =>
          p._1.get(tf.numFeatures) == res.best.bestParams.get(tf.numFeatures) &&
            p._1.get(lr.regParam) == res.best.bestParams.get(lr.regParam)),
        s"winner absent from rung at ${r.fraction}")
    }
  }

  test("selectRidgeCV: per-key k-fold grid search recovers planted models") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    // clean keys: lambda=0 must win and coefficients must recover
    val clean = (for {
      (key, (a, b, c)) <- Seq("ka" -> (2.0, -1.0, 0.5), "kb" -> (-3.0, 0.5, -1.0))
      i <- 1 to 200
    } yield {
      val x1 = rng.nextGaussian() * 3; val x2 = rng.nextGaussian() * 2
      (key, i.toLong, x1, x2, a * x1 + b * x2 + c + rng.nextGaussian() * 0.01)
    })
    // collinear key: x2 = x1 + tiny noise — per-key OLS explodes on the
    // near-singular Gram and generalizes badly; ridge must win CV
    val coll = (1 to 60).map { i =>
      val x1 = rng.nextGaussian() * 3
      val x2 = x1 + rng.nextGaussian() * 1e-3
      ("kc", i.toLong, x1, x2, x1 + x2 + rng.nextGaussian() * 0.5)
    }
    // thin key: 2 rows can never out-populate d=3 in any training fold —
    // must drop out silently, not error
    val thin = Seq(("kd", 1L, 1.0, 2.0, 3.0), ("kd", 2L, 2.0, 1.0, 1.0))
    val df = (clean ++ coll ++ thin).toDF("key", "id", "x1", "x2", "y")
    val lambdas = Seq(0.0, 0.5, 100.0)
    def run(parts: Int) = KeyedModels.selectRidgeCV(
      df.repartition(parts), Seq("key"), Seq("x1", "x2"), "y", "id",
      lambdas, numFolds = 3)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2),
          r.getAs[scala.collection.Seq[Double]]("coefficients"),
          r.getDouble(4), r.getLong(5)))
      .toMap
    val res = run(4)
    assert(!res.contains("kd"), "thin key must drop out, not error")
    for (k <- Seq("ka", "kb")) {
      val (lam, rmse, coef, icpt, n) = res(k)
      assert(lam == 0.0, s"$k: clean data must pick lambda 0, got $lam")
      assert(rmse < 0.05, s"$k: cv_rmse $rmse")
      assert(n == 200L)
      val want = if (k == "ka") (2.0, -1.0, 0.5) else (-3.0, 0.5, -1.0)
      assert(math.abs(coef(0) - want._1) < 0.02 &&
        math.abs(coef(1) - want._2) < 0.02 &&
        math.abs(icpt - want._3) < 0.02,
        s"$k: got coef=$coef icpt=$icpt want $want")
    }
    val (lamC, _, coefC, _, _) = res("kc")
    assert(lamC > 0.0, s"collinear key must prefer ridge, got lambda $lamC")
    // the ridge solution spreads credit over the collinear pair: the SUM
    // is identified (y ~ 2*x1) even though the split is not
    assert(math.abs(coefC.sum - 2.0) < 0.2, s"kc coefficient sum ${coefC.sum}")
    // fold hash is partitioning-independent: layouts only reorder float
    // accumulation
    val res13 = run(13)
    assert(res.keySet == res13.keySet)
    for (k <- res.keySet) {
      val (l1, r1, c1, i1, _) = res(k); val (l2, r2, c2, i2, _) = res13(k)
      assert(l1 == l2, s"$k: lambda differs across partitionings")
      assert(math.abs(r1 - r2) < 1e-8 && math.abs(i1 - i2) < 1e-6 &&
        c1.zip(c2).forall { case (x, y) => math.abs(x - y) < 1e-6 },
        s"$k: results drift across partitionings")
    }
  }

  test("MLWritable persistence: save -> load round-trips predictions (A5 capability)") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val df = (1 to 200).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      (Array(x1, x2), if (x1 + 2 * x2 > 0) 1.0 else 0.0)
    }.toDF("arr", "label")
      .select(array_to_vector($"arr").as("features"), $"label")
    val m = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(15).fit(df)
    val dir = java.nio.file.Files.createTempDirectory("ml_persist").toString + "/lr"
    m.write.overwrite().save(dir)
    val loaded =
      org.apache.spark.ml.classification.LogisticRegressionModel.load(dir)
    assert(loaded.coefficients == m.coefficients)
    assert(loaded.intercept == m.intercept)
    val a = m.transform(df).select($"prediction").as[Double].collect()
    val b = loaded.transform(df).select($"prediction").as[Double].collect()
    assert(a.sameElements(b))
  }

  test("gapplyRows applies a Row function per group under a given schema") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("k", "v")
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("vmax", DoubleType)))
    val out = GApply.gapplyRows(df, Seq("k"), schema) { (key, rows) =>
      Seq(Row(key.getString(0), rows.map(_.getDouble(1)).max))
    }
    val got = out.as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 3.0, "b" -> 10.0))
  }

  test("fitPca recovers the planted principal direction per key") {
    import spark.implicits._
    // key a: variance concentrated along (3,4,0)/5; key b: along (0,0,1).
    val rng = new scala.util.Random(11)
    def pts(key: String, v: Array[Double], n: Int) = (1 to n).map { _ =>
      val t = rng.nextGaussian() * 5.0
      (key,
        v(0) * t + rng.nextGaussian() * 0.1,
        v(1) * t + rng.nextGaussian() * 0.1,
        v(2) * t + rng.nextGaussian() * 0.1)
    }
    val df = (pts("a", Array(0.6, 0.8, 0.0), 300) ++
      pts("b", Array(0.0, 0.0, 1.0), 300))
      .toDF("k", "x1", "x2", "x3")
    val models = KeyedModels.fitPca(df, Seq("k"), Seq("x1", "x2", "x3"), k = 2)
    val rows = models.collect().map(r => r.getString(0) -> r).toMap
    def cosTo(r: org.apache.spark.sql.Row, v: Array[Double]): Double = {
      val c = r.getAs[collection.Seq[collection.Seq[Double]]]("components").head
      math.abs(c.zip(v).map { case (a, b) => a * b }.sum) /
        math.sqrt(c.map(x => x * x).sum)
    }
    assert(cosTo(rows("a"), Array(0.6, 0.8, 0.0)) > 0.99)
    assert(cosTo(rows("b"), Array(0.0, 0.0, 1.0)) > 0.99)
    // spectrum: the planted direction dominates the noise floor
    val evA = rows("a").getAs[collection.Seq[Double]]("explained_variance")
    assert(evA.head > 10 * evA(1), s"expected dominant first eigenvalue: $evA")
    // PCA identity: variance of component-0 scores equals eigenvalue 0
    val scored = KeyedModels.transformPca(df, models, Seq("k"),
      Seq("x1", "x2", "x3"))
      .select($"k", element_at($"pca_scores", 1).as("s0"))
      .groupBy($"k").agg(var_samp($"s0").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(scored("a") - evA.head) / evA.head < 1e-6,
      s"score variance ${scored("a")} vs eigenvalue ${evA.head}")
    // reconstruction error: against a k=1 model (subspace = the planted
    // direction alone), an off-axis outlier inflates max_resid by orders
    // of magnitude over the ~0.01 noise floor. k=1 keeps the test
    // deterministic — with k=2 the second component's direction inside
    // the noise plane is arbitrary and could absorb the outlier.
    val m1 = KeyedModels.fitPca(df, Seq("k"), Seq("x1", "x2", "x3"), k = 1)
    val withOutlier = df.unionByName(
      Seq(("a", 0.0, 0.0, 10.0)).toDF("k", "x1", "x2", "x3"))
    val sc = KeyedModels.scorePca(withOutlier, m1, Seq("k"),
      Seq("x1", "x2", "x3"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("max_resid")).toMap
    // (0,0,10) ⊥ (0.6,0.8,0): residual ≈ 100
    assert(sc("a") > 50.0, s"outlier residual should dominate: $sc")
  }

  test("fitKMeans recovers planted per-key clusters") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = for {
      key <- Seq("g1", "g2"); c <- Seq(-5.0, 5.0); _ <- 1 to 100
    } yield (key, c + rng.nextGaussian() * 0.3, c + rng.nextGaussian() * 0.3)
    val df = rows.toDF("key", "x", "y").repartition(4)
    val cents = KeyedModels.fitKMeans(df, Seq("key"), Seq("x", "y"), k = 2)
    val byKey = cents.collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getSeq[Double](2), r.getLong(3))).toSeq)
      .toMap
    Seq("g1", "g2").foreach { key =>
      val centroids = byKey(key).map(_._1.head).sorted
      assert(math.abs(centroids(0) + 5.0) < 0.3, s"$key: $centroids")
      assert(math.abs(centroids(1) - 5.0) < 0.3, s"$key: $centroids")
      assert(byKey(key).map(_._2).sum == 200)
    }
  }

  test("sweepKMeans recovers planted k per key, partitioning-invariant") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // g2: two blobs at ±6; g3: three blobs at -8/0/8 — well separated so
    // the simplified silhouette peaks at the true k, not a split/merge.
    val rows =
      (for (c <- Seq(-6.0, 6.0); _ <- 1 to 80)
        yield ("g2", c + rng.nextGaussian() * 0.4, c + rng.nextGaussian() * 0.4)) ++
      (for (c <- Seq(-8.0, 0.0, 8.0); _ <- 1 to 80)
        yield ("g3", c + rng.nextGaussian() * 0.4, c + rng.nextGaussian() * 0.4))
    val df = rows.toDF("key", "x", "y")
    val sweep = KeyedModels.sweepKMeans(
      df.repartition(7), Seq("key"), Seq("x", "y"), ks = 2 to 5)
    val got = sweep.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.length == 8, s"2 keys x 4 candidate ks: ${got.length}")
    val bestByKey = got.filter(_._5).map(t => t._1 -> t._2).toMap
    assert(bestByKey == Map("g2" -> 2, "g3" -> 3), s"planted k: $bestByKey")
    // elbow curve sanity: WSS nonincreasing in k for each key
    got.groupBy(_._1).foreach { case (k, rs) =>
      val wss = rs.sortBy(_._2).map(_._3)
      assert(wss.zip(wss.tail).forall { case (a, b) => b <= a + 1e-9 },
        s"$k WSS not monotone: ${wss.toSeq}")
    }
    // partitioning invariance: Lloyd init sorts the group, so a different
    // physical layout must reproduce bit-identical scores
    val again = KeyedModels.sweepKMeans(
      df.repartition(1), Seq("key"), Seq("x", "y"), ks = 2 to 5)
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4)))
    assert(got.sortBy(t => (t._1, t._2)).toSeq ==
      again.sortBy(t => (t._1, t._2)).toSeq)
    // the chosen k refits to the same centroids fitKMeans would produce
    val refit = KeyedModels.fitKMeans(
      df.filter($"key" === "g3"), Seq("key"), Seq("x", "y"), k = 3)
    assert(refit.count() == 3)
  }

  test("ModelExport exposes coefficients as joinable tables (A5)") {
    import spark.implicits._
    val lr = new LogisticRegression().setMaxIter(5)
    val m = lr.fit(embFeatures).asInstanceOf[
      org.apache.spark.ml.classification.LogisticRegressionModel]
    val coefs = ModelExport.logisticCoefficients(spark, m)
    assert(coefs.columns.toSeq ==
      Seq("class_index", "feature_index", "weight"))
    // 10 classes × (64 features + intercept)
    assert(coefs.count() == 10 * 65)
    assert(coefs.filter($"feature_index" === -1).count() == 10)
  }

  test("importLinear: export -> import -> transform equals the original model (A5)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = (1 to 300).map { _ =>
      val x1 = rng.nextDouble() * 4; val x2 = rng.nextDouble() * 3
      (Array(x1, x2), 3.0 * x1 - 2.0 * x2 + 1.0 + rng.nextGaussian() * 0.01)
    }.toDF("arr", "label")
      .select(array_to_vector($"arr").as("features"), $"label")
    val m = new org.apache.spark.ml.regression.LinearRegression()
      .setMaxIter(20).fit(df)
    val imported = ModelExport.importLinear(
      ModelExport.linearCoefficients(spark, m))
    assert(imported.coefficients == m.coefficients)
    assert(imported.intercept == m.intercept)
    val orig = m.transform(df).select($"prediction").as[Double].collect()
    val got = imported.transform(df).select($"prediction").as[Double].collect()
    orig.zip(got).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("importLogistic: multinomial round-trip predicts identically (A5)") {
    import spark.implicits._
    val lr = new LogisticRegression().setMaxIter(5)
    val m = lr.fit(embFeatures)
    val imported = ModelExport.importLogistic(
      ModelExport.logisticCoefficients(spark, m))
    assert(imported.numClasses == m.numClasses)
    assert(imported.coefficientMatrix == m.coefficientMatrix)
    val orig = m.transform(embFeatures).select($"prediction").as[Double].collect()
    val got = imported.transform(embFeatures).select($"prediction").as[Double].collect()
    assert(orig.toSeq == got.toSeq)
  }

  test("importLogistic: binary coefficient table rebuilds a binary model (A5)") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val df = (1 to 300).map { _ =>
      val cls = rng.nextInt(2)
      val c = if (cls == 0) -1.5 else 1.5
      (Array(c + rng.nextGaussian() * 0.4, c + rng.nextGaussian() * 0.4), cls.toDouble)
    }.toDF("arr", "label")
      .select(array_to_vector($"arr").as("features"), $"label")
    val m = new LogisticRegression().setMaxIter(20).fit(df)
    val imported = ModelExport.importLogistic(
      ModelExport.logisticCoefficients(spark, m))
    assert(imported.numClasses == 2)
    val orig = m.transform(df).select($"prediction").as[Double].collect()
    val got = imported.transform(df).select($"prediction").as[Double].collect()
    assert(orig.toSeq == got.toSeq)
  }

  test("q_model_gate margins tie to importLogistic model.transform bit-for-bit") {
    import spark.implicits._
    import graft.operators.PipelineOps
    // rebuild the declared query's planted classifier as a REAL MLlib model
    val w = PipelineOps.gateWeights
    val coef = (w.zipWithIndex.map { case (wt, i) => (0, i, wt) }.toSeq :+
      ((0, -1, PipelineOps.gateIntercept)))
      .toDF("class_index", "feature_index", "weight")
    val model = ModelExport.importLogistic(coef)
    assert(model.numClasses == 2)
    val feat = PipelineOps.gateFeatures(
      graft.engine.Tables.documents(spark, sf)
        .select($"source", $"doc_id", $"text"))
      .withColumn("m", PipelineOps.gateMargin)
      .select($"m", array_to_vector(array($"f0", $"f1", $"f2", $"f3"))
        .as("features"))
    val rows = model.transform(feat)
      .select($"m", $"rawPrediction", $"prediction").collect()
    assert(rows.length >= 500)
    rows.foreach { r =>
      val m = r.getDouble(0)
      val raw = r.getAs[org.apache.spark.ml.linalg.Vector](1)
      // binary LR rawPrediction = [-margin, margin]; the relational chain
      // must reproduce the f2jBLAS sequential dot EXACTLY (same IEEE ops,
      // same order) — not approximately
      assert(raw(1) == m, s"margin mismatch: model ${raw(1)} vs query $m")
      assert((r.getDouble(2) == 1.0) == (m > 0.0),
        "prediction and margin>0 gate disagree")
    }
    // the declared threshold must split the organic corpus — a gate that
    // keeps (or drops) everything proves nothing
    assert(rows.exists(_.getDouble(0) > 0.0), "no doc kept")
    assert(rows.exists(_.getDouble(0) <= 0.0), "no doc dropped")
  }

  test("TrainValidationSearch returns a fitted best model") {
    val lr = new LogisticRegression().setMaxIter(10)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 1.0)).build()
    val tv = TrainValidationSearch(lr, grid,
      new MulticlassClassificationEvaluator().setMetricName("accuracy"))
      .fit(embFeatures)
    assert(tv.validationMetrics.length == 2)
  }

  test("calibrateIntervals: qhat tracks each key's noise scale; coverage >= 1-alpha") {
    import spark.implicits._
    // planted per-key linear data with deterministic uniform-ish noise in
    // [-e_k, e_k]: key a has e=1.0, key b e=3.0. The conformal qhat must
    // land near each key's 0.9 noise quantile (0.9*e for uniform) and the
    // resulting intervals must cover ~90% of a fresh split.
    def mk(lo: Int, hi: Int) = (lo until hi).flatMap { i =>
      Seq("a", "b").map { k =>
        val e = if (k == "a") 1.0 else 3.0
        val x = (i % 50).toDouble
        val noise = (((i * 2654435761L + k.hashCode) % 2001 + 2001) % 2001
          - 1000) / 1000.0 * e
        (k, x, 2.0 * x + 5.0 + noise)
      }
    }.toDF("k", "x", "y")
    val train = mk(0, 400)
    val calib = mk(400, 700)
    val test = mk(700, 1000)
    val models = KeyedModels.fitLinear(train, Seq("k"), Seq("x"), "y")
    val cal = KeyedModels.calibrateIntervals(
      calib, models, Seq("k"), Seq("x"), "y", alpha = 0.1)
    val qh = cal.select($"k", $"qhat").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(qh("a") - 0.9) < 0.25, s"qhat(a)=${qh("a")}")
    assert(math.abs(qh("b") - 2.7) < 0.6, s"qhat(b)=${qh("b")}")
    val iv = KeyedModels.withIntervals(
      test, models, cal, Seq("k"), Seq("x"))
    val cov = iv.select(
        ($"y" >= $"prediction_lo" && $"y" <= $"prediction_hi")
          .cast("int").as("hit"))
      .agg(avg($"hit")).head.getDouble(0)
    assert(cov >= 0.85 && cov <= 1.0, s"coverage=$cov")
  }

  test("Word2Vec: planted co-occurrence geometry + doc-vector pipeline") {
    import spark.implicits._
    import org.apache.spark.ml.feature.Word2Vec
    // Two disjoint topic vocabularies. Each sentence mixes words from ONE
    // topic, so skip-gram must embed same-topic words closer than
    // cross-topic words, and the averaged doc vector must be linearly
    // separable by topic.
    val rng = new scala.util.Random(11)
    val topicA = Array("ore", "magma", "basalt", "quartz", "granite")
    val topicB = Array("kelp", "coral", "plankton", "brine", "lagoon")
    val docs = (1 to 300).map { i =>
      val vocab = if (i % 2 == 0) topicA else topicB
      val words = (1 to 8).map(_ => vocab(rng.nextInt(vocab.length)))
      (words.mkString(" "), (i % 2).toDouble)
    }.toDF("text", "label")
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val w2v = new Word2Vec().setInputCol("words").setOutputCol("features")
      .setVectorSize(16).setMinCount(1).setSeed(7).setMaxIter(4)
    // (a) raw embedding geometry: same-topic cosine > cross-topic cosine
    val w2vModel = w2v.fit(tok.transform(docs))
    val vecs = w2vModel.getVectors.collect()
      .map(r => r.getString(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val within = cos(vecs("ore"), vecs("basalt"))
    val across = cos(vecs("ore"), vecs("coral"))
    assert(within > across,
      s"same-topic cosine $within should exceed cross-topic $across")
    // findSynonyms of a topic-A word must surface topic-A words first
    val syn = w2vModel.findSynonymsArray("magma", 3).map(_._1)
    assert(syn.exists(topicA.contains),
      s"synonyms of 'magma' contain no topic-A word: ${syn.mkString(",")}")
    // (b) full pipeline: Tokenizer -> Word2Vec doc vectors -> LR
    val lr = new LogisticRegression().setMaxIter(20)
    val pipe = new Pipeline().setStages(Array(tok, w2v, lr))
    val model = pipe.fit(docs)
    org.apache.spark.ml.graftbridge.ModelFactory.stripTrainingSummary(model)
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(model.transform(docs))
    assert(acc >= 0.9, s"Word2Vec pipeline accuracy $acc < 0.9")
  }
}
