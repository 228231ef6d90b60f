package graft.ml

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.graftbridge.ModelFactory
import org.apache.spark.ml.linalg.{Matrices, Vectors}
import org.apache.spark.ml.regression.LinearRegressionModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Model↔data interchange — the capability behind spark-sklearn's
  * `Converter.toSKLearn`/`toSpark` (pub: python/spark_sklearn/converter.py;
  * SURVEY.md §2.A A5). In a Spark-native engine there is no foreign model
  * object to copy coefficients into; the equivalent capability is exposing
  * fitted models AS DATA — coefficient tables that can be joined, stored,
  * or exported to any system — plus the import direction:
  * [[importLinear]]/[[importLogistic]] rebuild USABLE MLlib models from
  * such tables (coefficients trained anywhere — another engine, a
  * notebook, [[KeyedModels]] — become distributed `transform`s here).
  * Collecting the coefficient table is correct at any scale: a model
  * object is driver-side by definition and the table is O(features),
  * not O(rows).
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

  /** Rebuild a usable [[LinearRegressionModel]] from a
    * (feature_index, weight) table in [[linearCoefficients]]' layout
    * (intercept at feature_index -1). Round-trips bit-exactly:
    * export→import→transform equals the original model's predictions. */
  def importLinear(coefficients: DataFrame,
      uid: String = "graft_lin_import"): LinearRegressionModel = {
    val m = coefficients
      .select(col("feature_index").cast("int"), col("weight").cast("double"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val nFeatures = m.keys.max + 1
    require(nFeatures > 0, "coefficient table has no feature rows")
    require((0 until nFeatures).forall(m.contains),
      s"coefficient table is missing feature indexes (have ${m.keys.toSeq.sorted})")
    ModelFactory.linear(uid,
      Vectors.dense(Array.tabulate(nFeatures)(m)), m.getOrElse(-1, 0.0))
  }

  /** Rebuild a usable [[LogisticRegressionModel]] from a
    * (class_index, feature_index, weight) table in
    * [[logisticCoefficients]]' layout. One coefficient row-class means the
    * binary model (numClasses = 2); more means multinomial. */
  def importLogistic(coefficients: DataFrame,
      uid: String = "graft_log_import"): LogisticRegressionModel = {
    val m = coefficients
      .select(col("class_index").cast("int"), col("feature_index").cast("int"),
        col("weight").cast("double"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val nRows = m.keys.map(_._1).max + 1
    val nFeatures = m.keys.map(_._2).max + 1
    require(nRows > 0 && nFeatures > 0, "empty coefficient table")
    val intercepts = Array.tabulate(nRows)(c => m.getOrElse((c, -1), 0.0))
    val binary = nRows == 1
    // MLlib requires the binomial coefficient matrix ROW-major and accepts
    // column-major for multinomial; build the layout each path expects
    val matrix =
      if (binary)
        new org.apache.spark.ml.linalg.DenseMatrix(1, nFeatures,
          Array.tabulate(nFeatures)(f => m((0, f))), true)
      else
        Matrices.dense(nRows, nFeatures,
          Array.tabulate(nRows * nFeatures)(i => m((i % nRows, i / nRows))))
    ModelFactory.logistic(uid, matrix, Vectors.dense(intercepts),
      numClasses = if (binary) 2 else nRows, isMultinomial = !binary)
  }
}
