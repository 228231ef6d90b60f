package org.apache.spark.ml.graftbridge

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.linalg.{Matrix, Vector}
import org.apache.spark.ml.regression.LinearRegressionModel
import org.apache.spark.ml.util.HasTrainingSummary

/** Bridge into MLlib's `private[ml]` model constructors, used by
  * [[graft.ml.ModelExport]] to rebuild usable models from coefficient
  * TABLES (the import direction of spark-sklearn's Converter, SURVEY.md
  * §2.A A5). MLlib deliberately hides these constructors from user code;
  * placing this one-file shim inside the `org.apache.spark.ml` package
  * tree is the standard public technique for constructing models from
  * externally-computed coefficients. Nothing else in the repo lives
  * outside the `graft` namespace.
  */
object ModelFactory {

  def linear(uid: String, coefficients: Vector,
      intercept: Double): LinearRegressionModel =
    new LinearRegressionModel(uid, coefficients, intercept)

  def logistic(uid: String, coefficientMatrix: Matrix,
      interceptVector: Vector, numClasses: Int,
      isMultinomial: Boolean): LogisticRegressionModel =
    new LogisticRegressionModel(
      uid, coefficientMatrix, interceptVector, numClasses, isMultinomial)

  /** Drop a fitted model's training summary (no-op for models without one).
    *
    * Why this must exist: a training summary holds the fitting
    * SparkSession, and `SparkSession.observationManager` is a
    * non-Serializable LAZY field — null (and thus harmless) until the
    * first `df.observe(...)` on the session, initialized (and fatal to
    * Java serialization) forever after. So a summary-bearing model works
    * in task closures right up until anyone uses an observation-based
    * quality gate ([[graft.engine.Gates]]) on the same session, at which
    * point every `model.transform` that ships the model to executors dies
    * with `Task not serializable`. Search loops evaluate thousands of
    * throwaway fold models whose summaries nobody reads — stripping them
    * removes the whole failure class (and the pointless payload).
    */
  def stripTrainingSummary(m: AnyRef): Unit = m match {
    case h: HasTrainingSummary[_] => h.setSummary(None); ()
    // Composite models carry no summary themselves but their STAGES do —
    // a PipelineModel(…, LogisticRegressionModel) still ships the fitting
    // session through the LR stage's summary if we stop at the top level.
    case p: org.apache.spark.ml.PipelineModel =>
      p.stages.foreach(stripTrainingSummary)
    case _ => ()
  }
}
