package graft.ml

import scala.util.Random

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.evaluation.Evaluator
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel,
  TrainValidationSplit, TrainValidationSplitModel}
import org.apache.spark.sql.DataFrame

/** Distributed hyperparameter search with the reference's ergonomics
  * (spark-sklearn `GridSearchCV` / `RandomizedSearchCV` — pub:
  * python/spark_sklearn/grid_search.py, random_search.py; SURVEY.md §2.A
  * A1/A2), rebuilt on MLlib's CrossValidator.
  *
  * The scale redesign (SURVEY.md §3.1): the reference broadcast the WHOLE
  * dataset to every worker and ran single-node sklearn fits, one Spark
  * task per (params, fold). Here every fit is itself a distributed Spark
  * job over a DataFrame that never leaves the cluster; `parallelism`
  * controls how many (params, fold) fits run concurrently. 100 TB of
  * training data changes nothing structurally.
  */
final case class GridSearchCV(
    estimator: Estimator[_],
    paramGrid: Array[ParamMap],
    evaluator: Evaluator,
    numFolds: Int = 3,
    parallelism: Int = 4,
    seed: Long = 42L) {

  def fit(df: DataFrame): SearchResult = {
    val cv = new CrossValidator()
      .setEstimator(estimator)
      .setEstimatorParamMaps(paramGrid)
      .setEvaluator(evaluator)
      .setNumFolds(numFolds)
      .setParallelism(parallelism)
      .setSeed(seed)
    SearchResult.fromCrossValidator(cv.fit(df), paramGrid, evaluator)
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
  * MLlib analog — sampled ParamMaps feed the same CrossValidator). */
final case class RandomizedSearchCV(
    estimator: Estimator[_],
    paramDistributions: Seq[(Param[Any], ParamDist[Any])],
    nIter: Int,
    evaluator: Evaluator,
    numFolds: Int = 3,
    parallelism: Int = 4,
    seed: Long = 42L) {

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
    GridSearchCV(estimator, grid, evaluator, numFolds, parallelism, seed).fit(df)
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

/** Search outcome mirroring sklearn's `best_params_` / `best_score_` /
  * `cv_results_` surface. */
final case class SearchResult(
    model: CrossValidatorModel,
    bestParams: ParamMap,
    bestScore: Double,
    cvResults: Seq[(ParamMap, Double)]) {
  def bestModel: org.apache.spark.ml.Model[_] =
    model.bestModel.asInstanceOf[org.apache.spark.ml.Model[_]]
  def transform(df: DataFrame): DataFrame = model.transform(df)
}

object SearchResult {
  def fromCrossValidator(
      m: CrossValidatorModel,
      grid: Array[ParamMap],
      evaluator: Evaluator): SearchResult = {
    val results = grid.zip(m.avgMetrics).toSeq
    val best =
      if (evaluator.isLargerBetter) results.maxBy(_._2) else results.minBy(_._2)
    SearchResult(m, best._1, best._2, results)
  }
}
