package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine query: the Spark-native implementation plus (when
  * SQL-expressible) the ANSI SQL the driver runs in DuckDB as the oracle.
  * Column names MUST match between `run`'s output and the oracle's
  * projection — the driver sorts columns by name before hashing.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in Bench headline timing (all oracle queries are) */
    bench: Boolean = true)

object GQuery {
  /** Determinism helpers (SURVEY.md §5.2 hash-match hardening).
    *
    * Floating sums are order-dependent and Spark's shuffle-fetch order is
    * nondeterministic, so large-magnitude sums are accumulated in exact
    * decimal (per-row cast → exact decimal sum → double → round). Both
    * engines then compute bit-identical results regardless of row order
    * or parallelism — this also holds on a 1000-executor cluster, where
    * merge order is even less predictable than on local[32].
    */
  def dsum(c: Column, outScale: Int = 2): Column =
    round(sum(c.cast(DecimalType(30, 6))).cast("double"), outScale)

  /** SQL twin of [[dsum]] for the DuckDB oracle. */
  def dsumSql(expr: String, outScale: Int = 2): String =
    s"round(cast(sum(cast(($expr) as decimal(30,6))) as double), $outScale)"

  /** Deterministic average: exact decimal sum → double, then one IEEE
    * division — bit-identical in Spark and DuckDB (their native decimal
    * AVG implementations differ, so we avoid them).
    */
  def davg(c: Column, outScale: Int = 6): Column =
    round(sum(c.cast(DecimalType(30, 6))).cast("double") / count(c), outScale)

  def davgSql(expr: String, outScale: Int = 6): String =
    s"round(cast(sum(cast(($expr) as decimal(30,6))) as double) / count($expr), $outScale)"
}
