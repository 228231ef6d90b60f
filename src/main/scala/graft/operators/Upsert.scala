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
