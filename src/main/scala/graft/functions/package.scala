package graft

import org.apache.spark.sql.SparkSession

/** The engine's native Catalyst expression kernels (SURVEY.md §4,
  * escalation case (b)): codegen'd per-row text/vector primitives, each
  * byte-identical to a relational reference form proven in its spec.
  */
package object functions {

  /** Register every kernel under its SQL name on this session, so a
    * library user can call them from `expr`/`spark.sql` directly:
    * `dot_product`, `cosine_sim`, `ngram_stats`, `ngram_digests`,
    * `word_grams`, `repetition_stats`, `minhash_sig`, `cdc_chunks`,
    * `window_digests`. Idempotent; temp functions, session-scoped. */
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
  }
}
