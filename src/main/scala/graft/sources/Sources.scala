package graft.sources

import org.apache.spark.ml.feature.QuantileDiscretizer
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Secondary sources/sinks (SURVEY.md §2.B.1 ◻ set). Parquet is the
  * primary format (Tables.scala); CSV/JSON cover interchange. Schemas are
  * always explicit — schema inference reads the data twice and guesses,
  * both wrong at 100 TB.
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST") // corrupt rows fail loudly, not silently
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** PERMISSIVE ingest with bad-record QUARANTINE — the 100 TB posture
    * for untrusted feeds, where FAILFAST is right for curated data but a
    * single corrupt row must not kill a day-long load. Malformed rows
    * land in `_corrupt_record`; the caller gets (clean, quarantined) to
    * write to the lake and the quarantine area respectively, and the
    * split is ONE parse pass (cached) — not two reads of the source.
    *
    * The cache is load-bearing, not an optimization: since Spark 2.3 a
    * query that references only the internal corrupt-record column of a
    * raw file scan is disallowed (the parser prunes columns, so the
    * corrupt marker alone is not derivable) — materializing the parsed
    * frame first is the documented workaround, and at ingest the parsed
    * batch is about to be written anyway.
    *
    * The third element is the cached raw frame itself: call
    * `raw.unpersist()` once clean + quarantine are written, or repeated
    * ingests in a long-lived session accumulate cached partitions until
    * storage eviction kicks in. */
  def readJsonQuarantineCached(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    val raw = spark.read
      .schema(StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(
          corrupt, org.apache.spark.sql.types.StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path)
      .cache()
    val clean = raw.filter(col(corrupt).isNull).drop(corrupt)
    val quarantined = raw.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_record"))
    (clean, quarantined, raw)
  }

  /** Convenience form without the unpersist handle — fine for one-shot
    * jobs whose session ends after the load; long-lived sessions should
    * use [[readJsonQuarantineCached]] and unpersist the raw frame. */
  def readJsonQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val (clean, quarantined, _) = readJsonQuarantineCached(spark, path, schema)
    (clean, quarantined)
  }

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Partitioned parquet sink — the layout a 100 TB deployment writes
    * (per-partition directories enable static + dynamic partition
    * pruning on read; see SURVEY.md §4). */
  def writePartitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** XML interchange (Spark 4 ships the former spark-xml as a built-in
    * source). `rowTag` names the element that maps to one row. */
  def readXml(spark: SparkSession, path: String, schema: StructType,
      rowTag: String = "row"): DataFrame =
    spark.read.schema(schema)
      .option("rowTag", rowTag)
      .option("mode", "FAILFAST")
      .xml(path)

  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).xml(path)

  /** Bit-interleave (Morton / Z-order encode) bucket columns, `bits` low
    * bits each — composed from shift/and/or Columns, so it stays inside
    * whole-stage codegen. */
  private def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    var z: Column = lit(0L)
    for (b <- 0 until bits; i <- 0 until n) {
      val bit = shiftright(cols(i).cast("long"), b).bitwiseAND(lit(1L))
      z = z.bitwiseOR(shiftleft(bit, b * n + i))
    }
    z
  }

  /** Z-order-clustered parquet: sort the table by the Morton code of the
    * quantile-bucketized cluster columns, one file per z-range. Each file
    * then covers a tight min/max range on EVERY cluster column — parquet
    * footer stats let scans filtered on any of them skip most files/row
    * groups, where a plain sort only serves its leading column. This is
    * the data-skipping lever for the 2nd..nth filter column at 100 TB
    * (partitioning spends the 1st).
    *
    * Cost model: one approx-quantile sketch pass (QuantileDiscretizer,
    * relativeError 1e-3) + one range-shuffle write — the same price as
    * any clustered rewrite; typically run at compaction time, not per
    * query. Null cluster values land in the top bucket (clamped), so they
    * cluster together rather than spraying across files.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int): Unit = {
    require(zCols.nonEmpty && numFiles > 0)
    val bktCols = zCols.map(c => s"__zbkt_$c")
    val disc = new QuantileDiscretizer()
      .setInputCols(zCols.toArray)
      .setOutputCols(bktCols.toArray)
      .setNumBuckets(256)
      .setRelativeError(0.001)
      .setHandleInvalid("keep") // nulls -> extra bucket, clamped below
    val bucketed = disc.fit(df).transform(df)
    val z = interleaveBits(
      bktCols.map(c => least(col(c), lit(255.0))), bits = 8)
    bucketed
      .withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop(bktCols :+ "__z": _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the lake-maintenance pass that keeps scan
    * parallelism healthy after many incremental appends (thousands of
    * KB-sized files turn a columnar scan into a metadata storm). Rewrites
    * the directory into ~ceil(totalBytes / targetFileBytes) files with
    * coalesce (no shuffle; and since coalesce can only REDUCE the
    * partition count, the actual file count is min(requested, input
    * partitions) — the return value counts the files actually written,
    * not the request), staging into a sibling temp dir and swapping via
    * two renames on the path's own Hadoop FileSystem.
    *
    * Swap semantics, honestly: the two renames are each atomic on
    * HDFS-like filesystems, but there is an instant BETWEEN them where
    * the directory does not exist — a reader that lists the path exactly
    * in that window fails and must retry; a query that already planned
    * its file splits reads the .old paths and fails mid-scan. This is the
    * standard posture for a catalog-less lake (run compaction in a
    * maintenance window); a table format / manifest layer is what makes
    * the swap fully atomic, and this function is the file-level half of
    * that story. Crash recovery: if the process dies after rename-out but
    * before rename-in, the data is intact at `.<name>.compact.old` —
    * rename it back; nothing is deleted until the swap has completed. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files under $path")
    val total = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(hp.getParent, s".${hp.getName}.compact.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    val written = fs.listStatus(tmp)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val old = new org.apache.hadoop.fs.Path(hp.getParent, s".${hp.getName}.compact.old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(hp, old), s"could not stage out $hp")
    require(fs.rename(tmp, hp), s"could not swap in $tmp")
    fs.delete(old, true)
    written
  }

  /** Partition-wise compaction for a hive-layout lake directory: walks to
    * the leaf partition directories (any depth of `col=value` nesting) and
    * compacts each independently with [[compactParquet]] — the nightly
    * maintenance pass over ONLY the partitions an incremental load
    * touched would filter this list first. Partition values never change,
    * readers of untouched partitions see untouched files, and each leaf
    * swap is independently crash-safe. Returns (leafPath → files written).
    */
  def compactPartitionedParquet(spark: org.apache.spark.sql.SparkSession,
      path: String, targetFileBytes: Long = 128L * 1024 * 1024)
      : Map[String, Int] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val subdirs = fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (subdirs.isEmpty) Seq(p) else subdirs.toSeq.flatMap(s => leaves(s.getPath))
    }
    leaves(hp)
      .filter(l => fs.listStatus(l)
        .exists(f => f.isFile && f.getPath.getName.endsWith(".parquet")))
      .map(l => l.toString -> compactParquet(spark, l.toString, targetFileBytes))
      .toMap
  }

  /** Archival-tier parquet: zstd instead of the snappy default trades a
    * little write CPU for ~25-40% smaller files — at 100 TB that is the
    * difference between storage tiers, and scan-bound queries read less.
    * `level` 3 is the throughput sweet spot; bump to 9+ for cold data. */
  def writeParquetZstd(df: DataFrame, path: String, level: Int = 3,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.compression.codec.zstd.level", level.toString)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
