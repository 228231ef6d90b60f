package graft.ml

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Random

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.evaluation.Evaluator
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.tuning.{TrainValidationSplit, TrainValidationSplitModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed hyperparameter search with the reference's ergonomics
  * (spark-sklearn `GridSearchCV` / `RandomizedSearchCV` — pub:
  * python/spark_sklearn/grid_search.py, random_search.py; SURVEY.md §2.A
  * A1/A2), as an explicit k-fold loop over MLlib estimators.
  *
  * The scale redesign (SURVEY.md §3.1): the reference broadcast the WHOLE
  * dataset to every worker and ran single-node sklearn fits, one Spark
  * task per (params, fold). Here every fit is itself a distributed Spark
  * job over a DataFrame that never leaves the cluster; `parallelism`
  * controls how many (params, fold) fits run concurrently. 100 TB of
  * training data changes nothing structurally.
  *
  * The CV loop is hand-rolled (not MLlib's CrossValidator) because the
  * reference surface exposes what CrossValidator discards: PER-FOLD
  * scores (`cv_results_`'s splitN_test_score) and user-provided fold
  * assignments (`foldCol`, the `check_cv` analog — pass a column of
  * non-negative ints; rows with equal value mod numFolds share a fold).
  */
final case class GridSearchCV(
    estimator: Estimator[_],
    paramGrid: Array[ParamMap],
    evaluator: Evaluator,
    numFolds: Int = 3,
    parallelism: Int = 4,
    seed: Long = 42L,
    foldCol: Option[String] = None) {
  require(numFolds >= 2, s"numFolds must be >= 2, got $numFolds")

  private val Fold = "__graft_fold"

  def fit(df: DataFrame): SearchResult = {
    val folded = (foldCol match {
      case Some(c) => df.withColumn(Fold, pmod(col(c).cast("long"), lit(numFolds)).cast("int"))
      case None => df.withColumn(Fold, (rand(seed) * numFolds).cast("int"))
    }).cache()
    try {
      val pool = Executors.newFixedThreadPool(math.max(parallelism, 1))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        // one future per (candidate, fold): each is a full distributed fit
        val futures =
          for (pm <- paramGrid.toSeq; f <- 0 until numFolds) yield Future {
            val train = folded.filter(col(Fold) =!= f).drop(Fold)
            val test = folded.filter(col(Fold) === f).drop(Fold)
            val model = estimator.fit(train, pm).asInstanceOf[Model[_]]
            // Fold models are throwaways scored once; their training
            // summaries are never read and (summary -> SparkSession ->
            // initialized-by-observe ObservationManager) would poison the
            // transform's task closure — see ModelFactory.stripTrainingSummary.
            org.apache.spark.ml.graftbridge.ModelFactory.stripTrainingSummary(model)
            (pm, f, evaluator.evaluate(model.transform(test)))
          }
        val scores = Await.result(Future.sequence(futures), Duration.Inf)
        val perCandidate = paramGrid.toSeq.map { pm =>
          pm -> scores.collect { case (p, _, s) if p eq pm => s }
        }
        val avg = perCandidate.map { case (pm, ss) => pm -> ss.sum / ss.size }
        val (bestPm, bestScore) =
          if (evaluator.isLargerBetter) avg.maxBy(_._2) else avg.minBy(_._2)
        // refit the winner on the FULL data — the model users deploy.
        // Its summary is stripped too: SearchResult.transform must work on
        // sessions where observation gates have run (coefficients and
        // intercepts — everything ModelExport exposes — are unaffected).
        val bestModel =
          estimator.fit(folded.drop(Fold), bestPm).asInstanceOf[Model[_]]
        org.apache.spark.ml.graftbridge.ModelFactory.stripTrainingSummary(bestModel)
        SearchResult(bestModel, bestPm, bestScore, avg, perCandidate)
      } finally pool.shutdown()
    } finally { folded.unpersist(); () }
  }
}

/** Parameter distributions for randomized search. */
sealed trait ParamDist[+T] { def sample(rng: Random): T }
object ParamDist {
  final case class Choice[T](values: Seq[T]) extends ParamDist[T] {
    def sample(rng: Random): T = values(rng.nextInt(values.size))
  }
  final case class Uniform(lo: Double, hi: Double) extends ParamDist[Double] {
    def sample(rng: Random): Double = lo + (hi - lo) * rng.nextDouble()
  }
  /** Log-uniform over [lo, hi], the right prior for regularization. */
  final case class LogUniform(lo: Double, hi: Double) extends ParamDist[Double] {
    def sample(rng: Random): Double =
      math.exp(math.log(lo) + (math.log(hi) - math.log(lo)) * rng.nextDouble())
  }
}

/** A2: n_iter candidates sampled from per-param distributions (no native
  * MLlib analog — sampled ParamMaps feed the same k-fold loop). */
final case class RandomizedSearchCV(
    estimator: Estimator[_],
    paramDistributions: Seq[(Param[Any], ParamDist[Any])],
    nIter: Int,
    evaluator: Evaluator,
    numFolds: Int = 3,
    parallelism: Int = 4,
    seed: Long = 42L,
    foldCol: Option[String] = None) {

  /** Deterministic (seeded) candidate sample. */
  def sampleGrid(): Array[ParamMap] = {
    val rng = new Random(seed)
    Array.fill(nIter) {
      val pm = new ParamMap()
      paramDistributions.foreach { case (p, dist) => pm.put(p, dist.sample(rng)) }
      pm
    }
  }

  def fit(df: DataFrame): SearchResult = {
    val grid = sampleGrid()
    GridSearchCV(estimator, grid, evaluator, numFolds, parallelism, seed,
      foldCol).fit(df)
  }
}

/** A3-analog on a single split: thin TrainValidationSplit facade. */
final case class TrainValidationSearch(
    estimator: Estimator[_],
    paramGrid: Array[ParamMap],
    evaluator: Evaluator,
    trainRatio: Double = 0.75,
    parallelism: Int = 4,
    seed: Long = 42L) {
  def fit(df: DataFrame): TrainValidationSplitModel = {
    new TrainValidationSplit()
      .setEstimator(estimator)
      .setEstimatorParamMaps(paramGrid)
      .setEvaluator(evaluator)
      .setTrainRatio(trainRatio)
      .setParallelism(parallelism)
      .setSeed(seed)
      .fit(df)
  }
}

/** One successive-halving rung: the data fraction it ran on and every
  * surviving candidate's mean CV score at that fraction. */
final case class Rung(fraction: Double, scores: Seq[(ParamMap, Double)])

/** The halving outcome: the final full-data [[SearchResult]] over the
  * surviving candidates plus the full rung history (sklearn's
  * HalvingGridSearchCV `cv_results_` trajectory). */
final case class HalvingResult(best: SearchResult, rungs: Seq[Rung]) {
  def transform(df: DataFrame): DataFrame = best.transform(df)
}

/** SUCCESSIVE-HALVING grid search (sklearn's HalvingGridSearchCV shape):
  * score ALL candidates cheaply on a small deterministic slice of the
  * data, keep the top 1/factor, multiply the slice, repeat — so the
  * expensive full-data fits are spent only on candidates that survived
  * the cheap rungs. Slices are nested md5-hash buckets of a row hash
  * (fraction f keeps buckets < f·2³² — a LARGER fraction always
  * CONTAINS the smaller one, the property that makes rung scores
  * comparable and the whole trajectory reproducible on any
  * partitioning, unlike rand()-sampled rows). Each rung reuses the
  * [[GridSearchCV]] k-fold loop — every fit remains a fully distributed
  * Spark job (the §3.1 scale redesign) — and the survivors get one
  * final full-data GridSearchCV whose result is returned unchanged.
  * Rough cost vs plain grid: n·f₀ + (n/2)·f₀·2 + … ≈ one full-data
  * sweep of ~2 candidates instead of n. */
final case class HalvingSearchCV(
    estimator: Estimator[_],
    paramGrid: Array[ParamMap],
    evaluator: Evaluator,
    factor: Int = 2,
    minFraction: Double = 0.25,
    numFolds: Int = 2,
    parallelism: Int = 4,
    seed: Long = 42L) {
  require(factor >= 2, s"factor must be >= 2, got $factor")
  require(minFraction > 0.0 && minFraction <= 1.0, s"bad minFraction")

  def fit(df: DataFrame): HalvingResult = {
    val hashed = df.withColumn("__graft_h",
      pmod(xxhash64(struct(df.columns.map(col): _*), lit(seed)),
        lit(1L << 32)))
    var candidates = paramGrid
    var fraction = minFraction
    val rungs = scala.collection.mutable.ArrayBuffer.empty[Rung]
    while (candidates.length > 1 && fraction < 1.0) {
      val slice = hashed
        .filter(col("__graft_h") < lit((fraction * (1L << 32)).toLong))
        .drop("__graft_h")
      val res = GridSearchCV(estimator, candidates, evaluator,
        numFolds, parallelism, seed).fit(slice)
      val keep = math.max(
        math.ceil(candidates.length.toDouble / factor).toInt, 1)
      val ranked =
        if (evaluator.isLargerBetter) res.cvResults.sortBy(-_._2)
        else res.cvResults.sortBy(_._2)
      rungs += Rung(fraction, ranked)
      candidates = ranked.take(keep).map(_._1).toArray
      fraction = math.min(fraction * factor, 1.0)
    }
    val fin = GridSearchCV(estimator, candidates, evaluator,
      numFolds, parallelism, seed).fit(hashed.drop("__graft_h"))
    rungs += Rung(1.0,
      if (evaluator.isLargerBetter) fin.cvResults.sortBy(-_._2)
      else fin.cvResults.sortBy(_._2))
    HalvingResult(fin, rungs.toSeq)
  }
}

/** Search outcome mirroring sklearn's `best_params_` / `best_score_` /
  * `cv_results_` surface: `cvResults` carries the mean score per
  * candidate, `foldMetrics` the per-fold scores behind each mean (the
  * splitN_test_score columns). `bestModel` is refit on the full data. */
final case class SearchResult(
    bestModel: Model[_],
    bestParams: ParamMap,
    bestScore: Double,
    cvResults: Seq[(ParamMap, Double)],
    foldMetrics: Seq[(ParamMap, Seq[Double])]) {
  def transform(df: DataFrame): DataFrame = bestModel.transform(df)
}
