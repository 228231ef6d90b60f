package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("binary media table round-trips with typed metadata") {
    val media = Multimodal.syntheticMediaFromDocs(spark, sf)
    val row = media.head()
    assert(row.bytes.nonEmpty)
    assert(Set("png", "wav", "mp4").contains(row.format))
    assert(media.count() == 500)
  }

  test("feature extraction is partition-parallel, deterministic, fixed-dim") {
    import spark.implicits._
    val media = Multimodal.syntheticMediaFromDocs(spark, sf).repartition(7)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.rdd.getNumPartitions == 7, "mapPartitions must not shuffle")
    val a = feats.collect().map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b, "decode must be deterministic")
    assert(a.values.forall(_.size == DeterministicFakeCodec.featureDim))
  }

  test("fake codec features are content-sensitive") {
    val f1 = DeterministicFakeCodec.decodeFeatures("hello world".getBytes, "png")
    val f2 = DeterministicFakeCodec.decodeFeatures("hello worlc".getBytes, "png")
    val f3 = DeterministicFakeCodec.decodeFeatures("hello world".getBytes, "png")
    assert(f1.toSeq == f3.toSeq)
    assert(f1.toSeq != f2.toSeq)
  }

  test("native codec stub fails loudly, not silently") {
    intercept[UnsupportedOperationException] {
      NativeCodecStub.decodeFeatures(Array[Byte](1, 2), "png")
    }
  }

  test("frame sampling and resize plans are metadata-only") {
    import spark.implicits._
    val media = Multimodal.syntheticMediaFromDocs(spark, sf).toDF()
    val frames = Multimodal.frameSamplePlan(media, everyK = 5)
    val r = frames.filter($"media_id" === 12).select($"sample_frames")
      .as[Seq[Long]].head()
    assert(r == Seq(0L, 5L, 10L)) // doc 12 → n_frames = 12 % 30 + 1 = 13
    val resized = Multimodal.resizePlan(media, maxSide = 256)
    val bad = resized.filter($"out_w" > 256 || $"out_h" > 256).count()
    assert(bad == 0)
    // metadata ops must not read the binary column
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("bytes#") || !plan.contains("ReadSchema: struct<bytes"),
      "frame sampling should prune the bytes column")
  }

  test("metadata-only scans of the media LAKE prune the binary column") {
    // the 100 TB claim in the Multimodal scaladoc, as a plan assertion:
    // a metadata projection over the parquet media lake must never read
    // the (dominant) bytes column — column pruning reaches the scan
    val path = graft.sources.Lake.ensureMedia(spark, sf)
    val metaOnly = spark.read.parquet(path)
      .select("media_id", "format", "width", "height")
      .filter(org.apache.spark.sql.functions.col("format") === "png")
    val plan = metaOnly.queryExecution.executedPlan.toString
    val schema = "ReadSchema: [^\\n]*".r.findFirstIn(plan)
    assert(schema.isDefined, plan)
    assert(!schema.get.contains("bytes"),
      s"media metadata scan must prune the blob: ${schema.get}")
  }
}
