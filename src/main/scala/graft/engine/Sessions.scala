package graft.engine

import org.apache.spark.sql.SparkSession

/** Session utilities (SURVEY.md §2.A A10, pub: util.py
  * `createLocalSparkSession`). One place pins the settings every entry
  * point needs: UTC timezone (oracle parity), shuffle partitions sized to
  * cores (not the 200 default — wrong for local mode, and on a real
  * cluster you'd size to ~2-3× total executor cores).
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Cost-based-optimizer variant: CBO + join reorder read ANALYZE'd
    * catalog statistics to pick join order and build sides without hints.
    * Only affects catalog tables (saveAsTable + [[analyze]]); plain
    * `read.parquet` paths still rely on size-on-disk + AQE. */
  def localCbo(cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft-cbo"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Collect table + column statistics for the CBO. At 100 TB this is the
    * metadata pass you schedule after each load; NDV/min/max feed join
    * reorder and broadcast decisions. */
  def analyze(spark: SparkSession, table: String, columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${columns.mkString(", ")}")
    ()
  }
}
