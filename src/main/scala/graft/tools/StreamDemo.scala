package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Streams

/** Streaming usage example: replay the events table through a file-source
  * readStream, run the tumbling-window aggregation with a watermark, and
  * compare against the batch twin on the same data. Run:
  *   sbt "runMain graft.tools.StreamDemo /root/testdata/sf0.001"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    // stage the events file into a streaming source dir
    val srcDir = Files.createTempDirectory("stream_events")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    def normalize(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts",
        date_trunc("second",
          timestamp_micros((col("ts") / 1000L).cast("long"))
            .cast("timestamp_ntz")).cast("timestamp"))

    val stream = normalize(
      spark.readStream.schema(schema).parquet(srcDir.toString))
    val q = Streams.tumblingAggWatermarked(stream, "1 day", "1 hour")
      .writeStream.format("memory").queryName("agg")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("agg")
    println(s"== streaming tumbling agg (append mode, finalized windows) ==")
    streamed.orderBy("window_start", "event_type").show(8, false)

    val batch = Streams.tumblingAgg(
      normalize(spark.read.parquet(s"$sf/events.parquet")), "1 day")
    val bc = batch.count(); val sc = streamed.count()
    // append mode withholds windows not yet past the watermark — the open
    // tail day(s) — so streamed is a strict prefix of batch
    val joined = streamed.as("s").join(batch.as("b"),
      Seq("window_start", "event_type"))
      .filter($"s.n_events" =!= $"b.n_events").count()
    println(s"batch windows=$bc streamed(finalized)=$sc mismatched=$joined")
    assert(joined == 0, "finalized streaming windows must match batch")
    assert(sc > 0 && sc <= bc)
    println("OK: streaming output is a consistent prefix of the batch twin")
    spark.stop()
  }
}
