package org.apache.spark.ml.graftbridge

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.linalg.{Matrix, Vector}
import org.apache.spark.ml.regression.LinearRegressionModel

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
}
