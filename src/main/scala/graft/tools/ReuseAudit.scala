package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Registry

/** Whole-surface shared-subtree audit: executes every declared query on a
  * tiny SF and reports how often each base table is scanned in the FINAL
  * adaptive plan (the `== Initial Plan ==` section is stripped — it
  * double-counts every subtree AQE later deduplicates). A table scanned
  * more than once in the final plan is either a genuinely different
  * projection/filter (fine — the scans prune differently) or a shared
  * subtree that failed canonical equality, usually because one consumer
  * carries an inferred isnotnull the other lacks; an explicit
  * `.isNotNull` on the shared branch re-enables ReuseExchange (see
  * TpchShapes Q15/Q20 scaladocs for measured cases).
  *
  * Output: one line per query with >1 scan of any table, plus a total.
  * This is a REVIEW aid, not a gate — multi-scan is often legitimate
  * (self-joins on different slices, union fixtures), so findings need
  * case-by-case adjudication before "fixing".
  *
  *   sbt "runMain graft.tools.ReuseAudit /root/testdata/sf0.001"
  */
object ReuseAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // Location strings truncate at the default 100-char metadata limit,
      // which would hide the path this audit keys on.
      .config("spark.sql.maxMetadataStringLength", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    Registry.all.foreach { q =>
      try {
        val df = q.run(spark, dir)
        df.collect()
        val full = df.queryExecution.executedPlan.toString
        // keep only the final plan; AQE appends the pre-execution tree
        val plan = full.split("== Initial Plan ==")(0)
        // Key each scan node by the last segment of its Location root path
        // (works for single-file tables AND lake-fixture directories like
        // orders_by_month / media — a '.parquet' filename regex misses the
        // latter entirely).
        val scans = "Location: \\w+\\(\\d+ paths?\\)\\[([^\\]]*)\\]".r
          .findAllMatchIn(plan)
          .map(_.group(1).split(",")(0).trim
            .stripSuffix("/").split("/").last.stripSuffix(".parquet"))
          .toSeq.groupBy(identity).view.mapValues(_.size)
          .filter(_._2 > 1).toMap
        val reused = "ReusedExchange".r.findAllIn(plan).size
        if (scans.nonEmpty) {
          flagged += 1
          val detail = scans.toSeq.sortBy(-_._2)
            .map { case (t, n) => s"$t=$n" }.mkString(",")
          println(s"MULTISCAN ${q.name}: $detail reused=$reused")
        }
      } catch {
        case e: Throwable => println(s"ERROR ${q.name}: ${e.getMessage}")
      }
    }
    println(s"REUSE_AUDIT_DONE multiscan=$flagged of ${Registry.all.size}")
    spark.stop()
  }
}
