package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.StructType

/** Generic split-apply-combine — the Spark-native rebirth of
  * spark-sklearn's `gapply` (pub: python/spark_sklearn/group_apply.py;
  * SURVEY.md §2.A A7).
  *
  * The reference emulated per-group application driver-side with
  * `collect_list(struct(...))` + a Python UDF + explode, shipping whole
  * groups through py4j/pickle. Here it is one `groupByKey` shuffle and a
  * typed `flatMapGroups` — groups stream through the user function as
  * iterators inside executors; the Tungsten↔object boundary replaces the
  * JVM↔Python one (SURVEY.md §3.3).
  *
  * Scale note: unlike the Aggregator path (KeyedModels), flatMapGroups
  * sees each group as a whole — use it when the computation genuinely
  * needs the full group (quantile fits, per-group sorts); otherwise
  * prefer an algebraic Aggregator, which never buffers a group.
  */
object GApply {

  def gapply[T, K: Encoder, U: Encoder](ds: Dataset[T])(key: T => K)(
      f: (K, Iterator[T]) => IterableOnce[U]): Dataset[U] =
    ds.groupByKey(key).flatMapGroups((k: K, it: Iterator[T]) => f(k, it).iterator)

  /** Collect-free per-group apply where the result is one row per group. */
  def gapplyOne[T, K: Encoder, U: Encoder](ds: Dataset[T])(key: T => K)(
      f: (K, Iterator[T]) => U): Dataset[U] =
    ds.groupByKey(key).mapGroups((k: K, it: Iterator[T]) => f(k, it))

  /** Untyped variant with the reference's exact ergonomics
    * (`gapply(grouped, func, schema, *cols)`): group a DataFrame by key
    * columns, apply a Row-iterator function per group, union results
    * under a caller-supplied schema. Use when the schema is dynamic;
    * prefer the typed [[gapply]] when a case class models the rows.
    */
  def gapplyRows(df: DataFrame, keyCols: Seq[String], outSchema: StructType)(
      f: (Row, Iterator[Row]) => IterableOnce[Row]): DataFrame = {
    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    implicit val keyEnc: Encoder[String] = org.apache.spark.sql.Encoders.STRING
    val keyIdx = keyCols.map(c => df.schema.fieldIndex(c))
    // Collision-free composite key: each part is length-prefixed ("<len>:<str>",
    // null → "n"), so values containing any separator char — or a literal
    // "null" string vs an actual null — can never merge distinct groups.
    def part(v: Any): String =
      if (v == null) "n" else { val s = v.toString; s"${s.length}:$s" }
    df.groupByKey(r => keyIdx.map(i => part(r.get(i))).mkString)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val rows = it.buffered
        val key = Row.fromSeq(keyIdx.map(rows.head.get))
        f(key, rows).iterator
      }
  }
}
