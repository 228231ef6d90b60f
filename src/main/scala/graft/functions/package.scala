package graft

import org.apache.spark.sql.SparkSession

/** The engine's native Catalyst expression kernels (SURVEY.md §4,
  * escalation case (b)): codegen'd per-row text/vector primitives, each
  * byte-identical to a relational reference form proven in its spec.
  */
package object functions {

  /** Resolve the integer-literal argument of a registered kernel at
    * ANALYSIS time with a clean error: `window_digests(toks, w)` and
    * friends require a foldable non-null integer (the kernel is
    * specialized on it before execution), and a bare
    * `exprs(1).eval()` on a non-foldable or null argument would surface
    * as an opaque eval-time exception / NPE instead (round-13 ADVICE). */
  private[functions] def literalIntArg(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, arg: String): Int = {
    def fail(what: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          s"$fn: the $arg argument must be an integer literal, got $what"),
        None)
    if (!e.foldable) fail(e.sql)
    e.eval() match {
      case n: Number => n.intValue()
      case other => fail(String.valueOf(other))
    }
  }

  /** Register every kernel under its SQL name on this session, so a
    * library user can call them from `expr`/`spark.sql` directly:
    * `dot_product`, `cosine_sim`, `ngram_stats`, `ngram_digests`,
    * `word_grams`, `repetition_stats`, `minhash_sig`, `cdc_chunks`,
    * `window_digests`, `simhash64`. Idempotent; temp functions,
    * session-scoped. */
  def registerAllFunctions(spark: SparkSession): Unit = {
    DotProduct.register(spark)
    CosineSim.register(spark)
    NgramStats.register(spark)
    NgramDigests.register(spark)
    WordGrams.register(spark)
    RepetitionStats.register(spark)
    MinHashSig.register(spark)
    CdcChunks.register(spark)
    WindowDigests.register(spark)
    SimHash64.register(spark)
  }
}
