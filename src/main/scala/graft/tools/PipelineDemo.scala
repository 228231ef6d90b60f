package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Sessions, Tables}
import graft.operators.Upsert
import graft.sources.Sources

/** Runnable end-to-end pipeline walkthrough (the human-driven twin of
  * PipelineSpec): load → quality gate → CDC keep-latest → per-user
  * feature standardization → CDC merge of a late batch → partitioned
  * zstd landing → pruned read-back. Run:
  *   sbt "runMain graft.tools.PipelineDemo /root/testdata/sf0.001 /tmp/graft_pipeline"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.drop(1).headOption.getOrElse("/tmp/graft_pipeline")
    val spark = Sessions.local(appName = "graft-pipeline-demo")
    import spark.implicits._

    val events = Tables.events(spark, sf)
    println(s"[1] loaded ${events.count()} events from $sf")

    val clean = events.filter($"event_type".isNotNull && $"value" > 0)
    println(s"[2] quality gate kept ${clean.count()} rows")

    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts_ticks".desc, $"event_id".desc)
    val latest = clean.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    println(s"[3] keep-latest compaction → ${latest.count()} rows (one per user×type)")

    // simulate a late-arriving correction batch and merge it in
    val corrections = latest.limit(5)
      .withColumn("value", $"value" * 2)
      .withColumn("ts_ticks", $"ts_ticks" + 1)
    val merged = Upsert.mergeByKey(
      latest, corrections, Seq("user_id", "event_type"), "ts_ticks")
    println(s"[4] CDC merge of ${corrections.count()} corrections → ${merged.count()} rows")

    Sources.writeParquetZstd(
      merged.select($"user_id", $"event_type", $"event_id", $"value"),
      s"$out/snapshot", level = 3, partitionCols = Seq("event_type"))
    val back = spark.read.parquet(s"$out/snapshot")
      .filter($"event_type" === "click")
    println(s"[5] zstd snapshot written; pruned click read-back = ${back.count()} rows")
    spark.stop()
  }
}
