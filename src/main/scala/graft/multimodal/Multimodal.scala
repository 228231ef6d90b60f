package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY.md §2.B.8): image/audio/video as
  * opaque `binary` columns with typed metadata, processed by
  * partition-parallel decode/feature/resize/frame-sample operators.
  *
  * The actual media codecs are NOT available in this container, so the
  * decode step is a [[MediaCodec]] seam: [[DeterministicFakeCodec]] (a
  * seeded byte-statistics featurizer) keeps every downstream piece —
  * schema, partitioning, batch shape, feature join — real and testable;
  * a production deployment swaps in a JNI/FFmpeg-backed codec with the
  * same interface.
  *
  * Scale posture: media bytes never leave their partition (mapPartitions,
  * no shuffle); features (small fixed-width arrays) are what flows into
  * joins/ANN. At 100 TB the binary column stays in parquet and column
  * pruning means metadata-only queries never read it.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      bytes: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      n_frames: Int)

  case class MediaFeatures(
      media_id: Long,
      format: String,
      features: Array[Float])

  /** One-pass decode output: the typed metadata rides along with the
    * features, so profiling queries never join features back to the
    * source (which would scan the binary lake twice AND shuffle the
    * blobs on the join key). `n_bytes` replaces the raw payload — the
    * bytes are dropped inside the partition. */
  case class MediaFeaturesMeta(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      n_bytes: Long,
      features: Array[Float])

  /** Decode+featurize contract. Implementations must be deterministic per
    * byte content for replayable pipelines. */
  trait MediaCodec extends Serializable {
    def featureDim: Int
    def decodeFeatures(bytes: Array[Byte], format: String): Array[Float]
  }

  /** Container-safe stand-in for the real image/audio decoder: a 16-bin
    * byte histogram + 4 moments, normalized — deterministic, content-
    * sensitive, and shaped like a real embedding. */
  object DeterministicFakeCodec extends MediaCodec {
    val featureDim = 20
    def decodeFeatures(bytes: Array[Byte], format: String): Array[Float] = {
      val hist = new Array[Float](16)
      var sum = 0.0; var sumSq = 0.0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        hist(b >> 4) += 1f
        sum += b; sumSq += b.toDouble * b
        i += 1
      }
      val n = math.max(bytes.length, 1)
      val mean = sum / n
      val variance = sumSq / n - mean * mean
      val normHist = hist.map(_ / n)
      normHist ++ Array(
        n.toFloat, mean.toFloat, variance.toFloat,
        (bytes.headOption.map(_ & 0xff).getOrElse(0)).toFloat)
    }
  }

  /** Production codec seam — requires native media libraries not present
    * in this container. Wire ffmpeg/libjpeg here in a real deployment. */
  object NativeCodecStub extends MediaCodec {
    val featureDim = 20
    def decodeFeatures(bytes: Array[Byte], format: String): Array[Float] =
      throw new UnsupportedOperationException(
        "native media codecs are not available in this environment; " +
          "use DeterministicFakeCodec or provide a JNI-backed MediaCodec")
  }

  /** Partition-parallel decode → feature extraction. mapPartitions keeps
    * the heavy bytes local; only the small feature vectors are returned. */
  def extractFeatures(
      media: Dataset[MediaRow],
      codec: MediaCodec = DeterministicFakeCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.format,
          codec.decodeFeatures(r.bytes, r.format))
      }
    }
  }

  /** Single-pass decode → features WITH the source metadata attached:
    * the 100 TB profile shape — one scan of the binary lake, bytes
    * dropped in-partition, only fixed-width rows downstream. Use this
    * (not extractFeatures + join) whenever the consumer also needs the
    * media metadata. */
  def extractFeaturesWithMeta(
      media: Dataset[MediaRow],
      codec: MediaCodec = DeterministicFakeCodec): Dataset[MediaFeaturesMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeaturesMeta(r.media_id, r.format, r.width, r.height,
          r.n_frames, r.bytes.length.toLong,
          codec.decodeFeatures(r.bytes, r.format))
      }
    }
  }

  /** Frame-sample offsets for video rows: every `everyK`-th frame index.
    * Pure metadata computation — the bytes are untouched (and unread, if
    * the plan prunes them). */
  def frameSamplePlan(media: DataFrame, everyK: Int): DataFrame =
    media.select(col("media_id"), col("n_frames"),
      expr(s"filter(sequence(0, greatest(n_frames - 1, 0)), i -> i % $everyK = 0)")
        .as("sample_frames"))

  /** Resize spec: target box preserving aspect ratio (metadata-only; the
    * pixel work happens in the codec at decode time). */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.select(col("media_id"), col("width"), col("height"),
      expr(s"CASE WHEN greatest(width, height) <= $maxSide THEN 1.0 " +
        s"ELSE cast($maxSide as double) / greatest(width, height) END")
        .as("scale"))
      .withColumn("out_w", expr("cast(floor(width * scale) as int)"))
      .withColumn("out_h", expr("cast(floor(height * scale) as int)"))

  /** Test fixture: synthesize a media table from the documents table
    * (text bytes as payload) so the full pipeline runs in-container. */
  def syntheticMediaFromDocs(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.engine.Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("bytes"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "wav").otherwise("mp4").as("format"),
        (col("doc_id") % 640 + 32).cast("int").as("width"),
        (col("doc_id") % 480 + 32).cast("int").as("height"),
        (col("doc_id") % 30 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }
}
