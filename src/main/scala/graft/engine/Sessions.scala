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
}
