package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Upsert
import graft.streaming.Streams
import graft.streaming.Streams.Ev

/** Batch upsert / CDC-merge + streaming-upsert sink (round 2). The merge
  * is one shuffle on the key; the write path stages and swaps — nothing
  * materializes on the driver. */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("mergeByKey keeps the latest version per key; ties go to the update") {
    import spark.implicits._
    val base = Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L))
      .toDF("id", "payload", "version")
    val updates = Seq(
      (2L, "b2", 20L), // newer → wins
      (3L, "c-stale", 5L), // older → loses
      (1L, "a-tie", 10L), // same version → update wins
      (4L, "d", 1L)) // new key → inserted
      .toDF("id", "payload", "version")
    val got = Upsert.mergeByKey(base, updates, Seq("id"), "version")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a-tie", 10L), (2L, "b2", 20L),
      (3L, "c", 10L), (4L, "d", 1L)))
  }

  test("applyCdc tombstones delete keys; later re-insert resurrects") {
    import spark.implicits._
    val base = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "payload", "version")
    val changes = Seq(
      (1L, "x", 20L, true), // delete id 1
      (2L, "dead", 15L, true), // delete id 2 ...
      (2L, "b-back", 25L, false), // ... but a later version re-inserts
      (5L, "e", 1L, false))
      .toDF("id", "payload", "version", "is_delete")
    val got = Upsert.applyCdc(base, changes, Seq("id"), "version", "is_delete")
      .select("id", "payload", "version")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((2L, "b-back", 25L), (5L, "e", 1L)))
  }

  test("overwritePartitions rewrites only the partitions in the batch") {
    import spark.implicits._
    val path = tmp("upsert_part")
    val full = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-02", "b"),
      (3L, "2024-01-03", "c")).toDF("id", "day", "v")
    Upsert.overwritePartitions(full, path, Seq("day"))
    // replace day 2 only; days 1 and 3 must survive untouched
    val delta = Seq((2L, "2024-01-02", "b-new")).toDF("id", "day", "v")
    Upsert.overwritePartitions(delta, path, Seq("day"))
    val got = spark.read.parquet(path).select("id", "day", "v")
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "2024-01-01", "a"), (2L, "2024-01-02", "b-new"),
      (3L, "2024-01-03", "c")))
    // idempotence: re-running the same delta converges to the same state
    Upsert.overwritePartitions(delta, path, Seq("day"))
    assert(spark.read.parquet(path).count() == 3)
  }

  private val base = 1700002800000L
  private def ts(min: Long): Timestamp = new Timestamp(base + min * 60000L)

  test("toParquetSink lands streamed rows exactly once") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = tmp("sink_parquet"); val ckpt = tmp("sink_ckpt")
    mem.addData(Ev(1, 10, ts(0), "click", 1.0), Ev(2, 11, ts(1), "view", 2.0))
    val q = Streams.toParquetSink(mem.toDF(), out, ckpt)
    q.awaitTermination()
    mem.addData(Ev(3, 10, ts(2), "click", 3.0))
    val q2 = Streams.toParquetSink(mem.toDF(), out, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 3)
  }

  test("upsertToParquet maintains a keep-latest snapshot across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    // explicit file: URI — the sink must go through the Hadoop FileSystem
    // API (a java.io.File path would silently mis-handle the scheme)
    val out = "file:" + tmp("upsert_snap") + "/snap"
    val ckpt = tmp("upsert_ckpt")
    // two versions of user 10 in one batch + one of user 11
    mem.addData(Ev(1, 10, ts(0), "click", 1.0), Ev(2, 10, ts(5), "view", 2.0),
      Ev(3, 11, ts(1), "view", 7.0))
    val q = Streams.upsertToParquet(mem.toDF(), out, ckpt,
      keyCols = Seq("user_id"), versionCol = "ts")
    q.awaitTermination()
    // later batch updates user 11 and adds user 12
    mem.addData(Ev(4, 11, ts(9), "purchase", 9.0), Ev(5, 12, ts(2), "click", 4.0))
    val q2 = Streams.upsertToParquet(mem.toDF(), out, ckpt,
      keyCols = Seq("user_id"), versionCol = "ts")
    q2.awaitTermination()
    val got = spark.read.parquet(out)
      .select($"user_id", $"event_id", $"value")
      .orderBy($"user_id").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((10L, 2L, 2.0), (11L, 4L, 9.0), (12L, 5L, 4.0)))
  }

  test("upsertToPartitionedParquet rewrites only the partitions the batch touches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmp("upsert_part_snap")
    val out = "file:" + dir + "/snap"
    val ckpt = tmp("upsert_part_ckpt")
    val mem = MemoryStream[Ev]
    // batch 1 lands three partitions: click / view / error
    mem.addData(
      Ev(1, 10, ts(0), "click", 1.0),
      Ev(2, 11, ts(1), "view", 2.0),
      Ev(3, 12, ts(2), "error", 3.0))
    val q = Streams.upsertToPartitionedParquet(mem.toDF(), out, ckpt,
      keyCols = Seq("user_id"), versionCol = "ts",
      partitionCols = Seq("event_type"))
    q.awaitTermination()

    def filesIn(part: String): Set[String] = {
      val d = new java.io.File(s"$dir/snap/event_type=$part")
      d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val clickBefore = filesIn("click")
    val viewBefore = filesIn("view")
    val errorBefore = filesIn("error")

    // batch 2 touches ONLY the click partition (newer version of user 10
    // plus a new user 13)
    mem.addData(
      Ev(4, 10, ts(9), "click", 9.0),
      Ev(5, 13, ts(3), "click", 4.0))
    val q2 = Streams.upsertToPartitionedParquet(mem.toDF(), out, ckpt,
      keyCols = Seq("user_id"), versionCol = "ts",
      partitionCols = Seq("event_type"))
    q2.awaitTermination()

    // untouched partitions keep their exact files; the dirty one changed
    assert(filesIn("view") == viewBefore, "view partition was rewritten")
    assert(filesIn("error") == errorBefore, "error partition was rewritten")
    assert(filesIn("click") != clickBefore, "click partition not rewritten")

    val got = spark.read.parquet(out)
      .select($"user_id", $"event_id", $"value")
      .orderBy($"user_id").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((10L, 4L, 9.0), (11L, 2L, 2.0), (12L, 3L, 3.0),
      (13L, 5L, 4.0)))
  }
}
