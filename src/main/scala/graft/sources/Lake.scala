package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Date-partitioned "lake" layout for the partition-pruning operators
  * (SURVEY.md §2.B.1 partitioned sink / §4 pruning levers).
  *
  * The testdata tables are single parquet files, so the partitioned layout
  * a 100 TB deployment reads (one directory per date partition) has to be
  * materialized once per run: [[ensureOrdersByMonth]] writes the orders
  * table partitioned by `o_month = yyyy-MM(o_orderdate)` and the declared
  * queries (`q_scan_partitioned`, `q_join_dpp`) read it back. At scale the
  * write disappears — data already lands partitioned — and only the pruned
  * reads remain.
  *
  * The path is FIXED (not per-SF) because the DuckDB oracle SQL must embed
  * a literal `read_parquet` path: whichever SF ran Verify last owns the
  * lake, and the driver runs Verify and the oracle back-to-back on the
  * same SF, so the contract holds. Run oracle_check right after Verify for
  * the same SF when checking locally.
  */
object Lake {

  val root = "/tmp/graft_lake/current"

  val ordersByMonthPath: String = s"$root/orders_by_month"

  /** Glob the DuckDB oracle uses for the same data. */
  val ordersByMonthOracle: String =
    s"read_parquet('$ordersByMonthPath/*/*.parquet', hive_partitioning=true)"

  val documentsCsvPath: String = s"$root/documents_csv"
  val documentsCsvOracle: String =
    s"read_csv('$documentsCsvPath/*.csv', header=true)"

  val documentsJsonlPath: String = s"$root/documents_jsonl"
  val documentsJsonlOracle: String =
    s"read_json('$documentsJsonlPath/*.json', format='newline_delimited')"

  private val written = scala.collection.mutable.Set[String]()

  private def ensure(dir: String, path: String)(write: => Unit): String =
    synchronized {
      val key = s"$dir -> $path"
      if (!written(key)) {
        write
        written.retain(!_.endsWith(s"-> $path")) // path now holds THIS dir's data
        written += key
      }
      path
    }

  /** Write (at most once per JVM per source dir) the orders table
    * partitioned by month; returns the lake path. The month format
    * 'yyyy-MM' stays a plain string in both engines' partition-type
    * inference, so comparisons hash-match. */
  def ensureOrdersByMonth(spark: SparkSession, dir: String): String =
    ensure(dir, ordersByMonthPath) {
      val df = Tables.orders(spark, dir)
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      Sources.writePartitionedParquet(df, ordersByMonthPath, Seq("o_month"))
    }

  /** CSV interchange fixture: the documents metadata columns (no free
    * text — CSV quoting/escaping conventions differ across engines; the
    * clean columns are the honest CSV use-case). */
  def ensureDocumentsCsv(spark: SparkSession, dir: String): String =
    ensure(dir, documentsCsvPath) {
      Sources.writeCsv(
        Tables.documents(spark, dir).select("doc_id", "lang", "source", "n_chars"),
        documentsCsvPath)
    }

  /** JSON-lines interchange fixture: full documents rows — JSON escaping
    * is standardized, so free text round-trips across engines. */
  def ensureDocumentsJsonl(spark: SparkSession, dir: String): String =
    ensure(dir, documentsJsonlPath) {
      Sources.writeJsonLines(Tables.documents(spark, dir), documentsJsonlPath)
    }
}
