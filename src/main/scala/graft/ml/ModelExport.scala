package graft.ml

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.regression.LinearRegressionModel
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Model↔data interchange — the capability behind spark-sklearn's
  * `Converter.toSKLearn`/`toSpark` (pub: python/spark_sklearn/converter.py;
  * SURVEY.md §2.A A5). In a Spark-native engine there is no foreign model
  * object to copy coefficients into; the equivalent capability is exposing
  * fitted models AS DATA — coefficient tables that can be joined, stored,
  * or exported to any system — plus MLlib's own `MLWritable` persistence.
  */
object ModelExport {

  /** Coefficients of a linear regression as a (feature_index, weight)
    * table, with the intercept at index -1. */
  def linearCoefficients(spark: SparkSession,
      m: LinearRegressionModel): DataFrame = {
    import spark.implicits._
    ((-1, m.intercept) +:
      m.coefficients.toArray.toSeq.zipWithIndex.map(_.swap))
      .toDF("feature_index", "weight")
  }

  /** Coefficient matrix of a (possibly multinomial) logistic regression as
    * a (class_index, feature_index, weight) table; intercepts at
    * feature_index -1. */
  def logisticCoefficients(spark: SparkSession,
      m: LogisticRegressionModel): DataFrame = {
    import spark.implicits._
    val mat = m.coefficientMatrix
    val rows = for {
      c <- 0 until mat.numRows
      f <- 0 until mat.numCols
    } yield (c, f, mat(c, f))
    val intercepts = m.interceptVector.toArray.zipWithIndex.map {
      case (w, c) => (c, -1, w)
    }
    (rows ++ intercepts).toDF("class_index", "feature_index", "weight")
  }
}
