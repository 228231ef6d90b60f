package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-key model fitting — the scalable redesign of spark-sklearn's
  * `KeyedEstimator`/`KeyedModel` (pub: python/spark_sklearn/keyed_models.py;
  * SURVEY.md §2.A A8/A9).
  *
  * The reference collected every group's rows and ran an sklearn fit per
  * key, storing pickled Python objects in a column. Here closed-form
  * models are fit by an algebraic [[Aggregator]] that accumulates the
  * Gram matrix (XᵀX, Xᵀy): partial aggregation happens map-side, merges
  * are associative, and NO group is ever materialized — a key with a
  * billion rows costs the same fixed-size buffer as a key with ten.
  * Models land as plain rows (coefficients + stats), joinable data, not
  * opaque blobs.
  */
object KeyedModels {

  /** Fixed-size Gram buffer: upper triangle of XᵀX (augmented with the
    * intercept column), Xᵀy, count. d = nFeatures + 1. */
  final case class GramBuf(xtx: Array[Double], xty: Array[Double], n: Long)

  final case class LinearFit(
      coefficients: Array[Double], intercept: Double, n: Long)

  /** Solve the (d×d) normal equations from the packed upper triangle via
    * Gaussian elimination with partial pivoting. Driver-free: runs inside
    * the final aggregation, d is tiny (≤ tens of features). */
  private[graft] def solveNormal(d: Int, xtxU: Array[Double], xty: Array[Double]): Array[Double] = {
    val a = Array.ofDim[Double](d, d + 1)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      a(i)(j) = xtxU(idx); a(j)(i) = xtxU(idx); idx += 1
    }
    for (i <- 0 until d) a(i)(d) = xty(i)
    for (col <- 0 until d) {
      var p = col
      for (r <- col + 1 until d) if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r
      val t = a(col); a(col) = a(p); a(p) = t
      val piv = a(col)(col)
      require(math.abs(piv) > 1e-12, "singular normal equations (collinear features?)")
      for (r <- 0 until d if r != col) {
        val f = a(r)(col) / piv
        for (c <- col to d) a(r)(c) -= f * a(col)(c)
      }
    }
    Array.tabulate(d)(i => a(i)(d) / a(i)(i))
  }

  /** Aggregator fitting OLS with intercept, optionally ridge-regularized:
    * solves (XᵀX + λI')β = Xᵀy with the intercept unpenalized (I' zero at
    * position 0) — λ = 0 is exact OLS. The penalty only touches the
    * packed diagonal at finish, so the distributed Gram pass is identical
    * for every λ; a λ sweep (model selection) re-solves the same
    * aggregated buffer without another pass over the data. IN =
    * (features, y). */
  final class GramOLS(nFeatures: Int, lambda: Double = 0.0)
      extends Aggregator[(Seq[Double], Double), GramBuf, LinearFit] {
    require(lambda >= 0.0, s"ridge lambda must be >= 0, got $lambda")
    private val d = nFeatures + 1
    private val triLen = d * (d + 1) / 2

    def zero: GramBuf = GramBuf(new Array[Double](triLen), new Array[Double](d), 0L)

    def reduce(b: GramBuf, in: (Seq[Double], Double)): GramBuf = {
      val (fs, y) = in
      require(fs.size == nFeatures, s"expected $nFeatures features, got ${fs.size}")
      val x = new Array[Double](d)
      x(0) = 1.0
      var i = 0
      while (i < nFeatures) { x(i + 1) = fs(i); i += 1 }
      var idx = 0
      var r = 0
      while (r < d) {
        var c = r
        while (c < d) { b.xtx(idx) += x(r) * x(c); idx += 1; c += 1 }
        b.xty(r) += x(r) * y
        r += 1
      }
      GramBuf(b.xtx, b.xty, b.n + 1)
    }

    def merge(a: GramBuf, b: GramBuf): GramBuf = {
      var i = 0
      while (i < triLen) { a.xtx(i) += b.xtx(i); i += 1 }
      i = 0
      while (i < d) { a.xty(i) += b.xty(i); i += 1 }
      GramBuf(a.xtx, a.xty, a.n + b.n)
    }

    def finish(b: GramBuf): LinearFit = {
      val xtx =
        if (lambda == 0.0) b.xtx
        else {
          val c = b.xtx.clone()
          var diag = 0
          for (i <- 0 until d) {
            if (i > 0) c(diag) += lambda // intercept (i=0) unpenalized
            diag += d - i
          }
          c
        }
      val beta = solveNormal(d, xtx, b.xty)
      LinearFit(beta.drop(1), beta(0), b.n)
    }

    def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    def outputEncoder: Encoder[LinearFit] = Encoders.product[LinearFit]
  }

  /** Fit one OLS model per key. Input: key columns + numeric feature
    * columns + label. Output: one row per key with coefficients,
    * intercept, n — a model *table*. One shuffle on the key columns,
    * map-side partial Gram accumulation. */
  def fitLinear(
      df: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      yCol: String): DataFrame = {
    val agg = udaf(new GramOLS(featureCols.size))
    val featuresArr = array(featureCols.map(c => col(c).cast("double")): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(agg(featuresArr, col(yCol).cast("double")).as("model"))
      .select(keyCols.map(col) :+ col("model.coefficients").as("coefficients")
        :+ col("model.intercept").as("intercept") :+ col("model.n").as("n"): _*)
  }

  /** Per-key ridge regression: [[fitLinear]] with an L2 penalty λ on the
    * non-intercept coefficients — the stabilizer for keys with few rows or
    * collinear features, where per-key OLS blows up. Identical one-shuffle
    * Gram pass; prediction reuses [[transformLinear]] unchanged. */
  def fitRidge(
      df: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      yCol: String,
      lambda: Double): DataFrame = {
    val agg = udaf(new GramOLS(featureCols.size, lambda))
    val featuresArr = array(featureCols.map(c => col(c).cast("double")): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(agg(featuresArr, col(yCol).cast("double")).as("model"))
      .select(keyCols.map(col) :+ col("model.coefficients").as("coefficients")
        :+ col("model.intercept").as("intercept") :+ col("model.n").as("n"): _*)
  }

  /** Raw-Gram aggregator: same distributed pass as [[GramOLS]] but
    * finishes with the untouched sufficient statistics, so model
    * selection can re-solve them many times without touching the data. */
  final class GramRaw(nFeatures: Int)
      extends Aggregator[(Seq[Double], Double), GramBuf, GramBuf] {
    private val inner = new GramOLS(nFeatures)
    def zero: GramBuf = inner.zero
    def reduce(b: GramBuf, in: (Seq[Double], Double)): GramBuf = inner.reduce(b, in)
    def merge(a: GramBuf, b: GramBuf): GramBuf = inner.merge(a, b)
    def finish(b: GramBuf): GramBuf = b
    def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  }

  /** Per-key ridge PATH: fits every λ in `lambdas` from ONE Gram
    * aggregation pass — the point of sufficient-statistic models: the
    * data is read once, and each (key, λ) solve is O(d³) arithmetic on
    * the |keys|-row Gram table. The per-row solver is a scalar UDF, which
    * is exactly where a UDF belongs (B.11 preference order): the model
    * table after aggregation, never the data path. Bit-identical to
    * calling [[fitRidge]] separately per λ (MlSpec proves it). */
  def fitRidgePath(
      df: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      yCol: String,
      lambdas: Seq[Double]): DataFrame = {
    require(lambdas.nonEmpty && lambdas.forall(_ >= 0.0), s"bad lambdas: $lambdas")
    val nF = featureCols.size
    val agg = udaf(new GramRaw(nF))
    val featuresArr = array(featureCols.map(c => col(c).cast("double")): _*)
    val grams = df.groupBy(keyCols.map(col): _*)
      .agg(agg(featuresArr, col(yCol).cast("double")).as("g"))
    val solve = udf { (xtx: Seq[Double], xty: Seq[Double], n: Long, lam: Double) =>
      val d = nF + 1
      val a = xtx.toArray
      var diag = 0
      for (i <- 0 until d) {
        if (i > 0) a(diag) += lam
        diag += d - i
      }
      val beta = solveNormal(d, a, xty.toArray)
      LinearFit(beta.drop(1), beta(0), n)
    }
    val sess = df.sparkSession
    import sess.implicits._
    grams
      .crossJoin(broadcast(lambdas.toDF("lambda")))
      .withColumn("model", solve(col("g.xtx"), col("g.xty"), col("g.n"), col("lambda")))
      .select(keyCols.map(col) :+ col("lambda")
        :+ col("model.coefficients").as("coefficients")
        :+ col("model.intercept").as("intercept") :+ col("model.n").as("n"): _*)
  }

  /** Per-key model selection — GridSearchCV's job done per key with
    * sufficient statistics (A1 × A8): deterministic hash split on
    * `idCol`, ridge PATH fit on the train rows (one Gram pass for every
    * λ), every (key, λ) model scored on the held-out rows in one more
    * pass, best λ per key by (val RMSE, λ) argmin — exact RMSE ties break
    * toward the smaller λ. Two data passes total for the entire sweep,
    * independent of |lambdas|. Returns (keys..., best_lambda, val_rmse,
    * coefficients, intercept, n). */
  def selectRidge(
      df: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      yCol: String,
      idCol: String,
      lambdas: Seq[Double],
      valFraction: Int = 2): DataFrame = {
    require(valFraction >= 2, "valFraction is the denominator: 1/valFraction held out")
    val bucket = pmod(xxhash64(col(idCol)), lit(valFraction.toLong))
    val train = df.filter(bucket =!= 0)
    val holdout = df.filter(bucket === 0)
    val path = fitRidgePath(train, keyCols, featureCols, yCol, lambdas)
    val arrSql =
      featureCols.map(c => s"cast($c as double)").mkString("array(", ", ", ")")
    val y = col(yCol).cast("double")
    val scored = holdout.join(broadcast(path), keyCols)
      .withColumn("__pred",
        col("intercept") + expr(
          s"aggregate(zip_with($arrSql, coefficients, " +
            "(x, c) -> x * c), 0D, (s, v) -> s + v)"))
      .groupBy((keyCols.map(col) :+ col("lambda")): _*)
      .agg(sqrt(avg((y - col("__pred")) * (y - col("__pred")))).as("val_rmse"))
    val best = scored.groupBy(keyCols.map(col): _*)
      .agg(min_by(struct(col("lambda"), col("val_rmse")),
        struct(col("val_rmse"), col("lambda"))).as("b"))
      .select(keyCols.map(col) :+ col("b.lambda").as("best_lambda")
        :+ col("b.val_rmse").as("val_rmse"): _*)
    best.join(path.withColumnRenamed("lambda", "best_lambda"),
      keyCols :+ "best_lambda")
  }

  /** Gram re-aggregator over an already-aggregated Gram TABLE (input =
    * GramBuf rows, not data rows): folds per-(key, fold) buffers into
    * per-key totals. Model-table-sized work only. */
  final class GramMerge(nFeatures: Int)
      extends Aggregator[GramBuf, GramBuf, GramBuf] {
    private val inner = new GramOLS(nFeatures)
    def zero: GramBuf = inner.zero
    def reduce(b: GramBuf, in: GramBuf): GramBuf = inner.merge(b, in)
    def merge(a: GramBuf, b: GramBuf): GramBuf = inner.merge(a, b)
    def finish(b: GramBuf): GramBuf = b
    def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  }

  /** Per-key K-FOLD grid search — the GridSearchCV × KeyedModels
    * composition (the reference's per-key sk GridSearchCV shape, A1 × A8)
    * done with sufficient statistics instead of k·|λ| refits: folds are a
    * deterministic hash of `idCol` (reproducible on any partitioning);
    * ONE data pass accumulates a Gram buffer per (key, fold); because
    * Gram buffers are ADDITIVE, every fold's training Gram is just
    * total − held-out-fold (a zip_with subtraction on the model-sized
    * table — no second aggregation), and every λ re-solves the same
    * buffers at O(d³) each. The second and last data pass scores every
    * row against the model of its OWN held-out fold (broadcast join on
    * key+fold) and pools one cv_rmse per (key, λ); best λ per key by
    * (cv_rmse, λ) argmin, then the deployed model re-solves the TOTAL
    * Gram under the winning λ — the standard refit-on-all-data step,
    * again without touching the data. Two passes total, independent of
    * numFolds × |lambdas|. Keys too thin to train (a fold's training
    * side has ≤ d rows) drop out of that fold's scoring rather than
    * erroring. Returns (keys..., best_lambda, cv_rmse, coefficients,
    * intercept, n). */
  def selectRidgeCV(
      df: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      yCol: String,
      idCol: String,
      lambdas: Seq[Double],
      numFolds: Int = 3): DataFrame = {
    require(numFolds >= 2, s"numFolds must be >= 2, got $numFolds")
    require(lambdas.nonEmpty && lambdas.forall(_ >= 0.0), s"bad lambdas: $lambdas")
    val nF = featureCols.size
    val d = nF + 1
    val sess = df.sparkSession
    import sess.implicits._
    val data = df.withColumn("__fold",
      pmod(xxhash64(col(idCol)), lit(numFolds.toLong)).cast("int"))
    val gramAgg = udaf(new GramRaw(nF))
    val featuresArr = array(featureCols.map(c => col(c).cast("double")): _*)
    val perFold = data.groupBy((keyCols.map(col) :+ col("__fold")): _*)
      .agg(gramAgg(featuresArr, col(yCol).cast("double")).as("g"))
    // udaf() flattens the Product IN type into one parameter per field
    val mergeAgg = udaf(new GramMerge(nF))
    val tot = perFold.groupBy(keyCols.map(col): _*)
      .agg(mergeAgg(col("g.xtx"), col("g.xty"), col("g.n")).as("gt"))
    val solve = udf { (xtx: Seq[Double], xty: Seq[Double], n: Long, lam: Double) =>
      if (n <= d) None
      else {
        val a = xtx.toArray
        var diag = 0
        for (i <- 0 until d) { if (i > 0) a(diag) += lam; diag += d - i }
        val beta = solveNormal(d, a, xty.toArray)
        Some(LinearFit(beta.drop(1), beta(0), n))
      }
    }
    val foldModels = perFold.join(tot, keyCols)
      .withColumn("t_xtx", expr("zip_with(gt.xtx, g.xtx, (a, b) -> a - b)"))
      .withColumn("t_xty", expr("zip_with(gt.xty, g.xty, (a, b) -> a - b)"))
      .withColumn("t_n", col("gt.n") - col("g.n"))
      .crossJoin(broadcast(lambdas.toDF("lambda")))
      .withColumn("model",
        solve(col("t_xtx"), col("t_xty"), col("t_n"), col("lambda")))
      .filter(col("model").isNotNull)
      .select(keyCols.map(col) :+ col("__fold") :+ col("lambda")
        :+ col("model.coefficients").as("coefficients")
        :+ col("model.intercept").as("intercept"): _*)
    val arrSql =
      featureCols.map(c => s"cast($c as double)").mkString("array(", ", ", ")")
    val y = col(yCol).cast("double")
    val scored = data.join(broadcast(foldModels), keyCols :+ "__fold")
      .withColumn("__pred",
        col("intercept") + expr(
          s"aggregate(zip_with($arrSql, coefficients, " +
            "(x, c) -> x * c), 0D, (s, v) -> s + v)"))
      .groupBy((keyCols.map(col) :+ col("lambda")): _*)
      .agg(sqrt(avg((y - col("__pred")) * (y - col("__pred")))).as("cv_rmse"))
    val best = scored.groupBy(keyCols.map(col): _*)
      .agg(min_by(struct(col("lambda"), col("cv_rmse")),
        struct(col("cv_rmse"), col("lambda"))).as("b"))
      .select(keyCols.map(col) :+ col("b.lambda").as("best_lambda")
        :+ col("b.cv_rmse").as("cv_rmse"): _*)
    tot.join(broadcast(best), keyCols)
      .withColumn("model",
        solve(col("gt.xtx"), col("gt.xty"), col("gt.n"), col("best_lambda")))
      .filter(col("model").isNotNull)
      .select(keyCols.map(col) :+ col("best_lambda") :+ col("cv_rmse")
        :+ col("model.coefficients").as("coefficients")
        :+ col("model.intercept").as("intercept")
        :+ col("model.n").as("n"): _*)
  }

  /** A9: apply the per-key models — broadcast-join the (small) model table
    * to the data on the key columns and evaluate ŷ = β₀ + β·x as a
    * codegen'd expression. */
  def transformLinear(
      df: DataFrame,
      models: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      predictionCol: String = "prediction"): DataFrame = {
    val arrSql =
      featureCols.map(c => s"cast($c as double)").mkString("array(", ", ", ")")
    df.join(broadcast(models), keyCols)
      .withColumn(predictionCol,
        col("intercept") + expr(
          s"aggregate(zip_with($arrSql, coefficients, " +
            "(x, c) -> x * c), 0D, (s, v) -> s + v)"))
  }

  /** Weighted Gram aggregator for one IRLS step: IN = (features, z, w)
    * accumulating XᵀWX (upper triangle) and XᵀWz in the same fixed-size
    * buffer as [[GramOLS]] — map-side partials, associative merges, no
    * group ever materialized. A tiny ridge (1e-9·n on the diagonal) keeps
    * late IRLS steps non-singular when weights collapse on
    * near-separable keys. */
  final class GramWLS(nFeatures: Int)
      extends Aggregator[(Seq[Double], Double, Double), GramBuf, LinearFit] {
    private val d = nFeatures + 1
    private val triLen = d * (d + 1) / 2

    def zero: GramBuf = GramBuf(new Array[Double](triLen), new Array[Double](d), 0L)

    def reduce(b: GramBuf, in: (Seq[Double], Double, Double)): GramBuf = {
      val (fs, z, w) = in
      require(fs.size == nFeatures, s"expected $nFeatures features, got ${fs.size}")
      val x = new Array[Double](d)
      x(0) = 1.0
      var i = 0
      while (i < nFeatures) { x(i + 1) = fs(i); i += 1 }
      var idx = 0
      var r = 0
      while (r < d) {
        var c = r
        while (c < d) { b.xtx(idx) += w * x(r) * x(c); idx += 1; c += 1 }
        b.xty(r) += w * x(r) * z
        r += 1
      }
      GramBuf(b.xtx, b.xty, b.n + 1)
    }

    def merge(a: GramBuf, b: GramBuf): GramBuf = {
      var i = 0
      while (i < triLen) { a.xtx(i) += b.xtx(i); i += 1 }
      i = 0
      while (i < d) { a.xty(i) += b.xty(i); i += 1 }
      GramBuf(a.xtx, a.xty, a.n + b.n)
    }

    def finish(b: GramBuf): LinearFit = {
      val ridge = 1e-9 * math.max(b.n, 1L)
      val xtx = b.xtx.clone()
      var diag = 0
      for (i <- 0 until d) { xtx(diag) += ridge; diag += d - i }
      val beta = solveNormal(d, xtx, b.xty)
      LinearFit(beta.drop(1), beta(0), b.n)
    }

    def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    def outputEncoder: Encoder[LinearFit] = Encoders.product[LinearFit]
  }

  /** Per-key LOGISTIC regression via IRLS — the classification quadrant of
    * A8. Each of the (bounded) `iters` iterations is ONE partial+final
    * weighted-Gram pass: join the current coefficient table back to the
    * data, compute the working response z and weight w per row with
    * codegen'd expressions, re-aggregate, re-solve. No group is ever
    * buffered; per-iteration cost is a shuffle on the key columns, and the
    * model table (O(keys)) is localCheckpoint'd so lineage stays flat.
    * Labels must be 0/1. */
  def fitLogistic(
      df: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      yCol: String,
      iters: Int = 12): DataFrame = {
    val agg = udaf(new GramWLS(featureCols.size))
    val featuresArr = array(featureCols.map(c => col(c).cast("double")): _*)
    val arrSql =
      featureCols.map(c => s"cast($c as double)").mkString("array(", ", ", ")")
    val keyC = keyCols.map(col)

    var models = df.groupBy(keyC: _*).agg(count(lit(1)).as("n"))
      .select(keyC
        :+ expr(s"array_repeat(0D, ${featureCols.size})").as("coefficients")
        :+ lit(0.0).as("intercept") :+ col("n"): _*)
    for (_ <- 1 to iters) {
      val scored = df.join(models.select(keyC :+ col("coefficients") :+ col("intercept"): _*), keyCols)
        .withColumn("__eta",
          col("intercept") + expr(
            s"aggregate(zip_with($arrSql, coefficients, " +
              "(x, c) -> x * c), 0D, (s, v) -> s + v)"))
        .withColumn("__mu", lit(1.0) / (lit(1.0) + exp(-col("__eta"))))
        .withColumn("__w", greatest(col("__mu") * (lit(1.0) - col("__mu")), lit(1e-6)))
        .withColumn("__z",
          col("__eta") + (col(yCol).cast("double") - col("__mu")) / col("__w"))
      models = scored.groupBy(keyC: _*)
        .agg(agg(featuresArr, col("__z"), col("__w")).as("model"))
        .select(keyC :+ col("model.coefficients").as("coefficients")
          :+ col("model.intercept").as("intercept") :+ col("model.n").as("n"): _*)
        .localCheckpoint(true)
    }
    models
  }

  /** Apply per-key logistic models: broadcast-join the coefficient table
    * and emit P(y=1) plus the 0.5-threshold class. */
  def transformLogistic(
      df: DataFrame,
      models: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      probabilityCol: String = "probability",
      predictionCol: String = "prediction"): DataFrame = {
    val arrSql =
      featureCols.map(c => s"cast($c as double)").mkString("array(", ", ", ")")
    df.join(broadcast(models), keyCols)
      .withColumn(probabilityCol,
        lit(1.0) / (lit(1.0) + exp(-(col("intercept") + expr(
          s"aggregate(zip_with($arrSql, coefficients, " +
            "(x, c) -> x * c), 0D, (s, v) -> s + v)")))))
      .withColumn(predictionCol,
        (col(probabilityCol) >= 0.5).cast("double"))
  }

  /** Per-key mean model (the simplest keyed "transformer"): algebraic,
    * same scale posture. */
  def fitMean(df: DataFrame, keyCols: Seq[String], yCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(avg(col(yCol)).as("mean"), count(lit(1)).as("n"))

  /** Per-key KMeans (A8's "clusterer" estimator type): Lloyd iterations
    * inside a per-group closure via [[GApply.gapplyRows]]. Deterministic —
    * init picks evenly spaced points from the lexicographically sorted
    * group. This is the full-group-materialization path (SURVEY.md §7
    * hard-part 2): use for many SMALL groups; a global clustering over one
    * huge keyspace belongs to MLlib KMeans instead.
    */
  def fitKMeans(
      df: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      k: Int,
      iters: Int = 10): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val proj = df.select(
      (keyCols.map(col) ++ featureCols.map(c => col(c).cast("double"))): _*)
    val outSchema = StructType(
      keyCols.map(c => proj.schema(c)) ++ Seq(
        StructField("centroid_id", IntegerType, nullable = false),
        StructField("centroid", ArrayType(DoubleType), nullable = false),
        StructField("cluster_size", LongType, nullable = false)))
    val d = featureCols.size
    val nKeys = keyCols.size
    GApply.gapplyRows(proj, keyCols, outSchema) { (key, rows) =>
      val pts = rows.map(r => Array.tabulate(d)(i => r.getDouble(nKeys + i)))
        .toArray
      val (_, centroids, assign) = lloyd(pts, math.min(k, pts.length), iters)
      val kk = centroids.length
      val counts = new Array[Long](kk)
      assign.foreach(c => counts(c) += 1)
      (0 until kk).map { c =>
        Row.fromSeq(key.toSeq ++ Seq(c, centroids(c).toSeq, counts(c)))
      }
    }
  }

  /** Deterministic Lloyd: init = evenly spaced points of the
    * lexicographically sorted group, fixed iteration count, and ALL
    * accumulation (centroid sums, and hence every downstream score) runs
    * over the SORTED points — float addition order is then a function of
    * the group's values, never of partition arrival order, so results are
    * bit-identical under repartitioning. Shared by [[fitKMeans]] and
    * [[sweepKMeans]] so the sweep's chosen k reproduces exactly under a
    * refit. Returns (sortedPoints, centroids, assignment-over-sorted). */
  private def lloyd(
      ptsIn: Array[Array[Double]],
      kk: Int,
      iters: Int): (Array[Array[Double]], Array[Array[Double]], Array[Int]) = {
    val d = if (ptsIn.isEmpty) 0 else ptsIn(0).length
    implicit val ord: Ordering[Array[Double]] =
      Ordering.by((a: Array[Double]) => a.toSeq)(
        Ordering.Implicits.seqOrdering[Seq, Double])
    val pts = ptsIn.sorted
    var centroids = Array.tabulate(kk) { i =>
      pts(((i.toLong * (pts.length - 1)) / math.max(kk - 1, 1)).toInt).clone()
    }
    val assign = new Array[Int](pts.length)
    for (_ <- 1 to iters) {
      var p = 0
      while (p < pts.length) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var s = 0.0; var i = 0
          while (i < d) {
            val diff = pts(p)(i) - centroids(c)(i); s += diff * diff; i += 1
          }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        assign(p) = best
        p += 1
      }
      val sums = Array.fill(kk)(new Array[Double](d))
      val counts = new Array[Long](kk)
      p = 0
      while (p < pts.length) {
        val c = assign(p); counts(c) += 1
        var i = 0
        while (i < d) { sums(c)(i) += pts(p)(i); i += 1 }
        p += 1
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(d)(i => sums(c)(i) / counts(c))
      }
    }
    (pts, centroids, assign)
  }

  /** Per-key k-selection for [[fitKMeans]] — the clusterer analog of the
    * ridge-CV sweep: one pass over each group runs deterministic Lloyd at
    * every candidate k and scores it with (a) WSS (the elbow curve) and
    * (b) the SIMPLIFIED silhouette (Hruschka et al.: a = distance to own
    * centroid, b = nearest other centroid; s = (b-a)/max(a,b)), which is
    * O(n·k) per group instead of the O(n²) pairwise silhouette — the only
    * form that survives groups of 10⁶ rows. `best` marks the per-key
    * silhouette argmax (ties → smaller k, fewer clusters on equal
    * evidence). The group is materialized ONCE for the whole sweep (same
    * full-group posture as fitKMeans: many SMALL groups; one huge
    * keyspace belongs to MLlib). Partitioning-invariant: Lloyd init is a
    * sorted-order function of the group's values, never arrival order. */
  def sweepKMeans(
      df: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      ks: Seq[Int],
      iters: Int = 10): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    require(ks.nonEmpty && ks.forall(_ >= 2), "candidate ks must be >= 2")
    val proj = df.select(
      (keyCols.map(col) ++ featureCols.map(c => col(c).cast("double"))): _*)
    val outSchema = StructType(
      keyCols.map(c => proj.schema(c)) ++ Seq(
        StructField("k", IntegerType, nullable = false),
        StructField("wss", DoubleType, nullable = false),
        StructField("silhouette", DoubleType, nullable = false),
        StructField("best", BooleanType, nullable = false)))
    val d = featureCols.size
    val nKeys = keyCols.size
    val kCands = ks.distinct.sorted
    GApply.gapplyRows(proj, keyCols, outSchema) { (key, rows) =>
      val pts = rows.map(r => Array.tabulate(d)(i => r.getDouble(nKeys + i)))
        .toArray
      val scored = kCands.filter(_ <= pts.length).map { kk =>
        val (sp, centroids, assign) = lloyd(pts, kk, iters)
        def dist(p: Array[Double], c: Array[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < d) { val t = p(i) - c(i); s += t * t; i += 1 }
          math.sqrt(s)
        }
        var wss = 0.0; var silSum = 0.0
        var p = 0
        while (p < sp.length) {
          val own = dist(sp(p), centroids(assign(p)))
          wss += own * own
          var b = Double.MaxValue; var c = 0
          while (c < kk) {
            if (c != assign(p)) b = math.min(b, dist(sp(p), centroids(c)))
            c += 1
          }
          val m = math.max(own, b)
          silSum += (if (m > 0) (b - own) / m else 0.0)
          p += 1
        }
        (kk, wss, silSum / math.max(sp.length, 1))
      }
      val bestK =
        if (scored.isEmpty) -1 else scored.maxBy(s => (s._3, -s._1))._1
      scored.map { case (kk, wss, sil) =>
        Row.fromSeq(key.toSeq ++ Seq(kk, wss, sil, kk == bestK))
      }
    }
  }

  /** Per-key regression evaluation — the `score` half of the keyed-model
    * surface (sklearn's `estimator.score(X, y)` analog, per key). Applies
    * the model table via [[transformLinear]] and reduces each key to
    * (n, r2, rmse) in ONE combinable aggregation: SSE from the residuals,
    * SST from the sufficient statistics (Σy², Σy, n), so no second pass
    * over the data and no per-key materialization. Keys with zero label
    * variance get null r2 rather than a division by zero. */
  def scoreLinear(
      df: DataFrame,
      models: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      yCol: String): DataFrame = {
    val scored = transformLinear(df, models, keyCols, featureCols, "__pred")
    val y = col(yCol).cast("double")
    scored.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum((y - col("__pred")) * (y - col("__pred"))).as("__sse"),
        sum(y).as("__sy"),
        sum(y * y).as("__syy"))
      .withColumn("__sst", col("__syy") - col("__sy") * col("__sy") / col("n"))
      .withColumn("r2",
        when(col("__sst") > 0, lit(1.0) - col("__sse") / col("__sst")))
      .withColumn("rmse", sqrt(col("__sse") / col("n")))
      .drop("__sse", "__sy", "__syy", "__sst")
  }

  /** Split-conformal calibration of the per-key linear models: from a
    * CALIBRATION split (held out from the fit), the per-key
    * finite-sample-corrected quantile of the absolute residual,
    * `qhat = |resid|_(ceil((n+1)(1-alpha)))` — the half-width that makes
    * `prediction ± qhat` cover a fresh point with probability >= 1-alpha
    * under exchangeability, REGARDLESS of whether the linear model is
    * well-specified (the distribution-free guarantee; the model being
    * wrong just makes intervals wider). The order statistic is exact via
    * a per-key sorted collect — calibration sets are bounded by
    * construction (a held-out sample, not the corpus; at 100 TB you
    * sample the calibration split, you don't grow it), which is why this
    * is the one per-key pass allowed to materialize its group. */
  def calibrateIntervals(
      df: DataFrame,
      models: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      yCol: String,
      alpha: Double = 0.1): DataFrame = {
    val scored = transformLinear(df, models, keyCols, featureCols, "__pred")
    scored
      .withColumn("__r", abs(col(yCol).cast("double") - col("__pred")))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_calib"),
        sort_array(collect_list(col("__r"))).as("__rs"))
      .withColumn("qhat",
        element_at(col("__rs"),
          least(col("n_calib"),
            ceil((col("n_calib") + 1) * lit(1.0 - alpha)).cast("int"))
            .cast("int")))
      .drop("__rs")
  }

  /** Attach conformal intervals: prediction ± the key's calibrated qhat
    * (broadcast join — the calibration table is |keys|-sized). */
  def withIntervals(
      df: DataFrame,
      models: DataFrame,
      calib: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      predictionCol: String = "prediction"): DataFrame =
    transformLinear(df, models, keyCols, featureCols, predictionCol)
      .join(broadcast(calib.select((keyCols.map(col) :+ col("qhat")): _*)),
        keyCols)
      .withColumn(s"${predictionCol}_lo", col(predictionCol) - col("qhat"))
      .withColumn(s"${predictionCol}_hi", col(predictionCol) + col("qhat"))

  /** Fixed-size covariance buffer: per-feature sums, upper triangle of
    * ΣxxT, count. Like [[GramBuf]], O(d²) state per key regardless of
    * rows — the property that makes the per-key pass 100 TB-safe. */
  final case class CovBuf(s: Array[Double], ss: Array[Double], n: Long)

  final case class PcaFit(
      mean: Array[Double], components: Array[Array[Double]],
      explained_variance: Array[Double], n: Long)

  /** Cyclic Jacobi eigendecomposition of a symmetric d×d matrix (packed
    * upper triangle). Returns (eigenvalues, eigenvectors as rows) sorted
    * by eigenvalue descending, each vector's largest-|entry| coordinate
    * forced positive so the answer is unique (eigenvector sign is
    * otherwise arbitrary and would vary with sweep order). d is tiny
    * (≤ tens of features); this runs inside the aggregation finish, never
    * on a driver loop over keys. */
  private[graft] def jacobiEigen(d: Int, upper: Array[Double]): (Array[Double], Array[Array[Double]]) = {
    val a = Array.ofDim[Double](d, d)
    var idx = 0
    for (i <- 0 until d; j <- i until d) { a(i)(j) = upper(idx); a(j)(i) = upper(idx); idx += 1 }
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (j <- 0 until d) {
            val apj = a(p)(j); val aqj = a(q)(j)
            a(p)(j) = c * apj - s * aqj
            a(q)(j) = s * apj + c * aqj
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { j =>
      val vec = Array.tabulate(d)(i => v(i)(j))
      val m = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(m) < 0) vec.map(x => -x) else vec
    }.toArray
    (vals, vecs)
  }

  /** Aggregator computing per-key PCA from the covariance sufficient
    * statistics: one pass accumulates (Σx, ΣxxT, n) — partial+final
    * combinable, O(d²) state — and `finish` eigendecomposes the sample
    * covariance and keeps the top k components. IN = features. */
  final class CovPca(nFeatures: Int, k: Int)
      extends Aggregator[Seq[Double], CovBuf, PcaFit] {
    require(k >= 1 && k <= nFeatures, s"k must be in [1, $nFeatures], got $k")
    private val d = nFeatures
    private val triLen = d * (d + 1) / 2

    def zero: CovBuf = CovBuf(new Array[Double](d), new Array[Double](triLen), 0L)

    def reduce(b: CovBuf, fs: Seq[Double]): CovBuf = {
      require(fs.size == d, s"expected $d features, got ${fs.size}")
      val x = fs.toArray
      var idx = 0
      var r = 0
      while (r < d) {
        b.s(r) += x(r)
        var c = r
        while (c < d) { b.ss(idx) += x(r) * x(c); idx += 1; c += 1 }
        r += 1
      }
      CovBuf(b.s, b.ss, b.n + 1)
    }

    def merge(a: CovBuf, b: CovBuf): CovBuf = {
      var i = 0
      while (i < d) { a.s(i) += b.s(i); i += 1 }
      i = 0
      while (i < triLen) { a.ss(i) += b.ss(i); i += 1 }
      CovBuf(a.s, a.ss, a.n + b.n)
    }

    def finish(b: CovBuf): PcaFit = {
      require(b.n >= 2, s"per-key PCA needs >= 2 rows, got ${b.n}")
      val n = b.n.toDouble
      val mean = b.s.map(_ / n)
      val cov = new Array[Double](triLen)
      var idx = 0
      for (r <- 0 until d; c <- r until d) {
        cov(idx) = (b.ss(idx) - n * mean(r) * mean(c)) / (n - 1.0)
        idx += 1
      }
      val (vals, vecs) = jacobiEigen(d, cov)
      PcaFit(mean, vecs.take(k), vals.take(k), b.n)
    }

    def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    def outputEncoder: Encoder[PcaFit] = Encoders.product[PcaFit]
  }

  /** Fit one PCA per key (A8's "transformer" estimator type — sklearn
    * `PCA` per group): one shuffle on the key columns, map-side partial
    * covariance accumulation, eigendecomposition in the final aggregation.
    * Output: one row per key with mean, top-k components (rows), their
    * explained variances, and n — a model TABLE, joinable like every
    * other keyed model here. */
  def fitPca(
      df: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      k: Int): DataFrame = {
    val agg = udaf(new CovPca(featureCols.size, k))
    val featuresArr = array(featureCols.map(c => col(c).cast("double")): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(agg(featuresArr).as("model"))
      .select(keyCols.map(col) :+ col("model.mean").as("mean")
        :+ col("model.components").as("components")
        :+ col("model.explained_variance").as("explained_variance")
        :+ col("model.n").as("n"): _*)
  }

  /** Project rows onto their key's principal components (A9 for
    * [[fitPca]]): broadcast-join the model table on the key, score each
    * row as components · (x − mean). The model side is one row per key,
    * so the join is the same broadcast shape as [[transformLinear]]. */
  def transformPca(
      df: DataFrame,
      models: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      outputCol: String = "pca_scores"): DataFrame = {
    val project = udf {
      (comps: Seq[Seq[Double]], mean: Seq[Double], x: Seq[Double]) =>
        comps.map { w =>
          var s = 0.0
          var i = 0
          while (i < w.size) { s += w(i) * (x(i) - mean(i)); i += 1 }
          s
        }
    }
    val featuresArr = array(featureCols.map(c => col(c).cast("double")): _*)
    df.join(broadcast(models), keyCols)
      .withColumn(outputCol, project(col("components"), col("mean"), featuresArr))
      .drop("mean", "components", "explained_variance", "n")
  }

  /** Per-key PCA reconstruction error — the `score` half of [[fitPca]]
    * and the classic subspace anomaly signal (a row far from its key's
    * principal subspace is an outlier even when every coordinate is in
    * range). Components are orthonormal, so the squared residual is
    * ‖x−μ‖² − Σsᵢ² (no explicit reconstruction). Broadcast-join scoring
    * pass + one combinable aggregation per key: (n, mean/max residual). */
  def scorePca(
      df: DataFrame,
      models: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String]): DataFrame = {
    val resid = udf {
      (comps: Seq[Seq[Double]], mean: Seq[Double], x: Seq[Double]) =>
        var c2 = 0.0
        var i = 0
        while (i < x.size) {
          val d = x(i) - mean(i); c2 += d * d; i += 1
        }
        var s2 = 0.0
        comps.foreach { w =>
          var s = 0.0
          var j = 0
          while (j < w.size) { s += w(j) * (x(j) - mean(j)); j += 1 }
          s2 += s * s
        }
        math.max(c2 - s2, 0.0)
    }
    val featuresArr = array(featureCols.map(c => col(c).cast("double")): _*)
    df.join(broadcast(models), keyCols)
      .withColumn("__r2", resid(col("components"), col("mean"), featuresArr))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        avg(col("__r2")).as("mean_resid"),
        max(col("__r2")).as("max_resid"))
  }

  /** Per-key classification evaluation for [[fitLogistic]] models:
    * accuracy and log-loss (probabilities clipped to [1e-12, 1-1e-12]) in
    * one combinable aggregation after the broadcast-join scoring pass. */
  def scoreLogistic(
      df: DataFrame,
      models: DataFrame,
      keyCols: Seq[String],
      featureCols: Seq[String],
      yCol: String): DataFrame = {
    val scored =
      transformLogistic(df, models, keyCols, featureCols, "__p", "__pred")
    val y = col(yCol).cast("double")
    val p = greatest(least(col("__p"), lit(1.0 - 1e-12)), lit(1e-12))
    scored.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        avg((col("__pred") === y).cast("double")).as("accuracy"),
        avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))).as("logloss"))
  }
}
