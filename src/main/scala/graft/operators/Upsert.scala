package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch upsert / CDC-merge primitives (no table format required — works
  * against plain parquet directories, the lowest common denominator the
  * container allows; the same merge plan runs unchanged over Delta/Iceberg
  * by swapping the writer).
  *
  * Scale posture: the merge is ONE shuffle on the key columns (window
  * top-1), and the write path overwrites only the partitions present in
  * the batch (dynamic partition overwrite), so a 100 TB snapshot with a
  * 1 GB daily delta rewrites ~1 day of partitions, not the table.
  */
object Upsert {

  private val Src = "__graft_src"
  private val Rn = "__graft_rn"

  /** Merge `updates` into `base` by key: for each key the row with the
    * greatest `versionCol` survives; on version ties the update wins.
    * Both inputs must share a schema (unionByName). */
  def mergeByKey(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame = {
    val tagged = base.withColumn(Src, lit(0))
      .unionByName(updates.withColumn(Src, lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(Src).desc)
    tagged.withColumn(Rn, row_number().over(w))
      .filter(col(Rn) === 1)
      .drop(Rn, Src)
  }

  /** CDC apply: like [[mergeByKey]] but rows in `changes` whose
    * `deleteCol` is true act as tombstones — if the tombstone is the
    * latest version for its key, the key disappears from the result. */
  def applyCdc(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      deleteCol: String): DataFrame = {
    val baseWithFlag =
      if (base.columns.contains(deleteCol)) base
      else base.withColumn(deleteCol, lit(false))
    mergeByKey(baseWithFlag, changes, keyCols, versionCol)
      .filter(!col(deleteCol))
  }

  /** Incremental aggregate-state maintenance: fold a delta's PARTIAL
    * aggregate state into the stored rollup without rescanning history —
    * the materialized-view refresh pattern. The state schema per key is
    * (cnt, sum_*, min_*, max_*): every one of those merges associatively
    * (cnt+cnt, sum+sum, min(min), max(max)), so refreshing with deltas
    * d1 then d2 is IDENTICAL to aggregating base∪d1∪d2 from scratch
    * (PropertySpec proves it). Derived values (avg = sum/cnt) belong in a
    * view over the state, never in the state itself — they don't merge.
    * One shuffle on the key at |keys|-not-|rows| cost per refresh; sums
    * accumulate in exact decimal so refresh order can't change the bits.
    */
  def aggState(
      df: DataFrame,
      keyCols: Seq[String],
      sumCols: Seq[String] = Nil,
      minMaxCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val aggs =
      Seq(count(lit(1)).as("cnt")) ++
        sumCols.map(c => sum(col(c).cast(DecimalType(30, 6))).as(s"sum_$c")) ++
        minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two [[aggState]] tables (same keyCols/state schema). */
  def mergeAggState(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    val stateCols = a.columns.filterNot(keyCols.contains)
    require(stateCols.sameElements(b.columns.filterNot(keyCols.contains)),
      s"state schemas differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val aggs = stateCols.map {
      case c @ "cnt" => sum(col(c)).as(c)
      case c if c.startsWith("sum_") => sum(col(c)).as(c)
      case c if c.startsWith("min_") => min(col(c)).as(c)
      case c if c.startsWith("max_") => max(col(c)).as(c)
      case c => throw new IllegalArgumentException(s"non-mergeable state column: $c")
    }
    a.unionByName(b).groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Idempotent partitioned write: overwrites ONLY the partitions present
    * in `df` (dynamic partition overwrite), leaving every other partition
    * of the target untouched. Re-running the same batch converges to the
    * same state — the property a restartable pipeline needs. */
  def overwritePartitions(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
