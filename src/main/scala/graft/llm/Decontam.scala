package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-decontamination at scale (SURVEY.md §2.B.8): flag candidate
  * rows that share a key (typically an n-gram digest) with a much smaller
  * benchmark set.
  *
  * Two phases:
  *  1. BLOOM PREFILTER — aggregate the benchmark keys into a Bloom filter
  *     (distributed build via `df.stat.bloomFilter`, final sketch lives on
  *     the driver, shipped to executors as a broadcast). Probing is a
  *     per-row executor-local test: no shuffle touches the 100 TB
  *     candidate side, and the filter is megabytes for millions of
  *     benchmark grams.
  *  2. EXACT JOIN on the survivors — removes the bloom's false positives,
  *     so the end-to-end result is EXACTLY the plain equi-join's (which is
  *     why the declared query can share the decontam oracle). Only the
  *     ~fpp fraction of innocent rows plus the true overlaps reach the
  *     shuffle.
  *
  * Spark's own runtime row-level filtering injects the same shape
  * automatically for some shuffle joins
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), but it is
  * heuristic-gated; a corpus pipeline wants the prefilter guaranteed.
  */
object Decontam {

  /** Count, per candidate id, how many of its keys appear in the benchmark
    * key set. Rows with zero overlap are absent from the output.
    *
    * @param cand          candidate (id, key) pairs, assumed distinct
    * @param bench         benchmark keys (deduplicated inside)
    * @param keyCol        shared key column name
    * @param idCol         candidate id column name
    * @param expectedItems sizing hint for the bloom (upper bound on
    *                      distinct benchmark keys; no extra count job)
    * @param fpp           bloom false-positive rate — only affects how many
    *                      innocent rows reach the exact join, never results
    */
  def bloomOverlapCount(cand: DataFrame, bench: DataFrame, keyCol: String,
      idCol: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val benchKeys = bench.select(col(keyCol)).distinct()
    val bf = benchKeys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = cand.sparkSession.sparkContext.broadcast(bf)
    cand
      .filter(graft.functions.Bloom.mightContain(bc)(col(keyCol)))
      .join(benchKeys, keyCol)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}
