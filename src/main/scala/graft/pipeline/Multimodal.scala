package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: opaque bytes + typed metadata. The content
  * column stays `binary` end-to-end — Spark never interprets it; only
  * the decode boundary does. */
final case class MediaAsset(
    asset_id: Long,
    modality: String, // "image" | "audio" | "video"
    content: Array[Byte],
    mime_type: String,
    width: Option[Int], // image/video
    height: Option[Int],
    sample_rate: Option[Int], // audio
    duration_ms: Option[Long]) // audio/video

/** Extracted features for one asset (or one sampled frame). */
final case class MediaFeatures(
    asset_id: Long,
    modality: String,
    frame_index: Int,
    byte_len: Long,
    content_hash: String,
    feature: Array[Float])

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * Design: image/audio/video live as opaque `binary` columns with typed
  * metadata beside them (the schema of [[MediaAsset]]); decode /
  * feature-extraction / resize / frame-sampling run at a single
  * partition-iterator boundary ([[decodeAndFeaturize]]) — the Scala
  * analog of a vectorized Python `mapInPandas` stage: one function call
  * per *partition*, streaming over rows, so decoder initialization
  * amortizes and memory stays bounded by one asset at a time.
  *
  * The decoders themselves are STUBBED — media codecs are not
  * available in this environment — behind [[MediaCodec]], with a
  * deterministic fake keyed on the content hash. Everything Spark-side
  * (schema, binary handling, partitioning, batch iteration, per-frame
  * explode) is real and tested; swapping in a real codec changes only
  * the body of `MediaCodec.decode`.
  */
object Multimodal {

  /** The decode boundary. A production deployment implements this with
    * real codecs; the pipeline shape does not change. */
  trait MediaCodec extends Serializable {
    /** Decode bytes → per-frame float features. For images: one frame.
      * For audio: one frame per `frameMs` window. For video: sampled
      * frames. */
    def decode(asset: MediaAsset, maxFrames: Int): Seq[Array[Float]]
  }

  /** Deterministic stand-in: features derived from md5 of the content,
    * so outputs are stable across runs and partitions — the shape an
    * integration test needs. */
  object StubCodec extends MediaCodec {
    def decode(asset: MediaAsset, maxFrames: Int): Seq[Array[Float]] = {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(asset.content)
      val frames = asset.modality match {
        case "image" => 1
        case "audio" | "video" =>
          math.min(maxFrames,
            math.max(1, (asset.duration_ms.getOrElse(1000L) / 1000L).toInt))
        case _ => 1
      }
      (0 until frames).map { f =>
        Array.tabulate(8) { i =>
          ((digest((f + i) % digest.length) & 0xff) / 255.0f)
        }
      }
    }
  }

  def hashHex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Partition-iterator decode + featurize: the `mapInPandas`-shaped
    * stage. Emits one row per decoded frame. */
  def decodeAndFeaturize(assets: Dataset[MediaAsset],
      codec: MediaCodec = StubCodec,
      maxFrames: Int = 4): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would happen here (amortized)
      it.flatMap { a =>
        val frames = codec.decode(a, maxFrames)
        val h = hashHex(a.content)
        frames.zipWithIndex.map { case (feat, idx) =>
          MediaFeatures(a.asset_id, a.modality, idx,
            a.content.length.toLong, h, feat)
        }
      }
    }
  }

  /** The pixel-transform boundary (resize/re-encode). Production
    * implements this with a real image library; the stub re-stamps
    * metadata and leaves bytes opaque (marked by a deterministic
    * prefix) so tests can assert the plumbing without a codec. */
  trait MediaResizer extends Serializable {
    def resize(asset: MediaAsset, w: Int, h: Int): MediaAsset
  }

  object StubResizer extends MediaResizer {
    def resize(a: MediaAsset, w: Int, h: Int): MediaAsset =
      a.copy(width = Some(w), height = Some(h),
        content = s"resized:${w}x$h:".getBytes("UTF-8") ++ a.content)
  }

  /** Partition-iterator resize pass over image assets; non-image rows
    * pass through untouched. Same single-boundary shape as
    * [[decodeAndFeaturize]]: swap the resizer, keep the plan. */
  def resizeImages(assets: Dataset[MediaAsset], w: Int, h: Int,
      resizer: MediaResizer = StubResizer): Dataset[MediaAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.modality == "image") resizer.resize(a, w, h) else a
      }
    }
  }

  /** Synthesize a deterministic asset table from the documents corpus
    * (bytes = utf8 text; metadata derived from doc fields) — exercises
    * the binary-column plumbing end-to-end without real media. */
  def syntheticAssets(spark: SparkSession, documents: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    documents
      .filter(col("text").isNotNull) // codec input must be bytes
      .select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime_type"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(640)).cast("int").as("width"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(480)).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, lit(16000)).cast("int")
        .as("sample_rate"),
      when(pmod(col("doc_id"), lit(3)) =!= 0, col("n_chars") * 10)
        .cast("long").as("duration_ms"))
      .as[MediaAsset]
  }

  /** Feature table as a DataFrame (for SQL-side joins with the rest of
    * the pipeline). */
  def featureTable(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    decodeAndFeaturize(syntheticAssets(spark, documents)).toDF()
  }
}
