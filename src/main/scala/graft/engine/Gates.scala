package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline observability (the operational seam every 100 TB
  * cleaning pipeline needs): quality metrics computed by `df.observe`
  * accumulators that RIDE the action — row counts, kept-rate, null rates
  * arrive with the job's result, instead of a second full scan to audit
  * what the first one did. At 100 TB the difference is one pass vs two.
  *
  * Batch usage (Spark's Observation helper):
  * {{{
  *   val (gated, obs) = Gates.observedFilter(docs, length($"text") > 10)
  *   gated.write.parquet(out)          // the one and only scan
  *   val kept = obs.get("rows_kept")   // metrics from that same scan
  * }}}
  * The same `observe` call works under Structured Streaming (metrics per
  * micro-batch via StreamingQueryListener) — one instrumentation point,
  * both execution modes.
  */
object Gates {

  /** Observed-metric names must be unique within one query, and an
    * Observation object cannot be re-registered — so defaulted names get
    * a process-unique suffix (gate_1, gate_2, …), letting callers stack
    * several gates in one pipeline without naming any of them. Explicit
    * names are used verbatim (pick distinct ones per query). */
  private val nameSeq = new java.util.concurrent.atomic.AtomicLong()
  private def autoName(base: String): String =
    s"${base}_${nameSeq.incrementAndGet()}"

  /** Attach named metrics to a frame in-pass. `obs.get` blocks until the
    * next action on the returned frame completes, then yields the metric
    * row as a Map. */
  def observed(df: DataFrame, name: String, metric: Column,
      metrics: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, metric, metrics: _*), obs)
  }

  /** Observed filter: apply a keep-predicate while metering rows_in /
    * rows_kept in the SAME pass (the metrics see the pre-filter stream;
    * the returned frame is post-filter). The funnel summary every
    * cleaning stage should emit, for free. */
  def observedFilter(df: DataFrame, keep: Column,
      name: String = ""): (DataFrame, Observation) = {
    val obs = Observation(if (name.isEmpty) autoName("gate") else name)
    val instrumented = df
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(keep, 1L).otherwise(0L)).as("rows_kept"))
      .filter(keep)
    (instrumented, obs)
  }

  /** Streaming-compatible gate: same rows_in / rows_kept metrics under a
    * string key via the name-keyed observe — the Observation helper is
    * batch-only, while this form surfaces per micro-batch in
    * StreamingQueryProgress.observedMetrics (StreamsSpec golden test).
    * One instrumentation point, both execution modes. */
  def observedFilterNamed(df: DataFrame, keep: Column,
      name: String): DataFrame =
    df.observe(name,
        count(lit(1)).as("rows_in"),
        sum(when(keep, 1L).otherwise(0L)).as("rows_kept"))
      .filter(keep)

  /** Observed null-rate audit over the named columns, riding whatever
    * action the caller runs next. */
  def observedNullAudit(df: DataFrame, cols: Seq[String],
      name: String = ""): (DataFrame, Observation) = {
    val obs = Observation(if (name.isEmpty) autoName("null_audit") else name)
    val metrics = count(lit(1)).as("rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
