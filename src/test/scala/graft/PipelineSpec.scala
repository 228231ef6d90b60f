package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables
import graft.sources.Sources

/** End-to-end pipeline integration (round 2): the stages a training-data
  * run chains — load, quality gate, keep-latest dedup, per-user feature
  * standardization, partitioned zstd landing, pruned re-read. Asserts the
  * stage composition, not any single operator (those have their own
  * specs/oracles). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("events flow load → filter → dedup → z-score → partitioned zstd → pruned read") {
    import spark.implicits._

    val events = Tables.events(spark, sf)
    val n0 = events.count()

    // quality gate: typed events only, positive values
    val clean = events.filter($"event_type".isNotNull && $"value" > 0)
    val n1 = clean.count()
    assert(n1 > 0 && n1 <= n0)

    // keep-latest per (user, type): CDC-style compaction
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts_ticks".desc, $"event_id".desc)
    val latest = clean.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    val n2 = latest.count()
    assert(n2 <= n1)
    assert(latest.groupBy($"user_id", $"event_type").count()
      .filter($"count" > 1).count() == 0, "dedup must leave unique keys")

    // per-user z-score over the cleaned stream (not the deduped slice)
    val wu = Window.partitionBy($"user_id")
    val feats = clean
      .withColumn("n", count(lit(1)).over(wu))
      .filter($"n" >= 2)
      .withColumn("mean", sum($"value").over(wu) / $"n")
      .withColumn("z", ($"value" - $"mean") /
        sqrt(sum(($"value" - $"mean") * ($"value" - $"mean")).over(wu) / ($"n" - 1)))
      .select($"event_id", $"user_id", $"event_type", $"z")

    // land partitioned by event_type with zstd
    val out = Files.createTempDirectory("pipeline_out").toString + "/feats"
    Sources.writeParquetZstd(feats, out, level = 3, partitionCols = Seq("event_type"))

    // re-read with a partition predicate: pruning must reach the source
    val back = spark.read.parquet(out).filter($"event_type" === "click")
    assert(back.count() == feats.filter($"event_type" === "click").count())
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)

    // z-scores are standardized: per-user mean ≈ 0 within float tolerance
    val drift = spark.read.parquet(out)
      .groupBy($"user_id").agg(avg($"z").as("mz"))
      .filter(abs($"mz") > 1e-9).count()
    assert(drift == 0, "per-user z-score means must be ~0")
  }
}
