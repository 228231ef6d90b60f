package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §4 scale posture). AQE's skew-join
  * splitting handles most cases automatically at runtime; these are the
  * explicit tools for the cases AQE can't fix:
  *  - a skewed AGGREGATION key (AQE only splits join partitions), and
  *  - a skewed join where the runtime stats are not yet available
  *    (first materialization).
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates: partial
    * aggregate on (key, salt) — spreading a hot key over `salts`
    * partitions — then final aggregate on key. Correct for any aggregate
    * expressible as (partial, merge) pairs; the caller provides both
    * phases.
    *
    * Example (sum + count → avg):
    * {{{
    * Skew.saltedAgg(df, Seq("k"), 16)(
    *   partial = Seq(sum("v").as("s"), count(lit(1)).as("n")),
    *   merge   = Seq(sum("s").as("s"), sum("n").as("n")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salts: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right
    * side: left rows get a random salt in [0, salts); the right side is
    * replicated `salts` times; the join key becomes (key, salt). Hot left
    * keys spread across `salts` tasks. Right-side replication costs
    * |right| × salts — use only when right is orders of magnitude smaller.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicatedRight = right.crossJoin(
      right.sparkSession.range(0, salts).toDF("__salt"))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-N heavy-hitter keys with counts — the diagnostic to decide
    * whether salting is needed at all (run on a sample at scale). */
  def heavyHitters(df: DataFrame, keyCols: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
      .limit(topN)
}
