package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram statistics over a token array: returns
  * `array<long>` of `[n_grams, n_distinct]` — the inputs to a repetition
  * score (1 − distinct/total).
  *
  * The composable form — `transform(sequence(...), i -> concat_ws(' ',
  * slice(l, i, n)))` then `array_distinct` — is correct but runs
  * INTERPRETED: four higher-order passes that each materialize an array of
  * gram strings per row. Repetition scoring touches every document in the
  * corpus, so this is a per-row hot loop worth a native Catalyst
  * `Expression` (SURVEY.md §4 decision record, escalation case (b)), like
  * [[DotProduct]] for the vector path: one pass, one hash set, no
  * intermediate arrays.
  *
  * Distinctness is computed on the actual gram byte strings (a HashSet of
  * UTF8String), not a lossy hash, so counts are exactly the composable
  * form's (NgramStatsSpec proves equality, plus codegen ≡ interpreted).
  * Token elements must be non-null (true for `split` output, the only
  * producer in this engine).
  */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"ngram_stats expects (array<string>, n >= 1), got " +
        s"(${child.dataType.sql}, $n)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    NgramStats.count(arr, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.NgramStats.count($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
}

object NgramStats {

  private val SEP = UTF8String.fromString(" ")

  /** Shared kernel for the interpreted and codegen paths (codegen emits a
    * static call instead of inlining the loop — the loop body is a hash
    * set, not arithmetic, so there is nothing for codegen to fuse; what
    * matters is evaluating inside the generated row loop without lambda
    * frames or intermediate arrays). */
  def count(arr: ArrayData, n: Int): GenericArrayData = {
    val len = arr.numElements()
    val total = if (len >= n) (len - n + 1).toLong else 0L
    var distinct = 0L
    if (total > 0) {
      val set = new java.util.HashSet[UTF8String]()
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < total) {
        var k = 0
        while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
        set.add(UTF8String.concatWs(SEP, parts: _*))
        i += 1
      }
      distinct = set.size().toLong
    }
    new GenericArrayData(Array(total, distinct))
  }

  /** Register `ngram_stats(tokens, n)` (n a literal) for `expr`/SQL use on
    * this session. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_stats",
      exprs => NgramStats(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
}
