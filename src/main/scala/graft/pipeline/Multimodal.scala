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
  * Image decode is REAL: [[ImageIoCodec]] decodes PNG/JPEG/GIF/BMP
  * bytes with the JDK's `javax.imageio` (always present — no external
  * codec needed) into width/height/channels plus exact per-channel
  * means, and [[ImageIoResizer]] does a real pixel resize + PNG
  * re-encode. Audio decode is REAL too: [[WavCodec]] decodes WAV/PCM
  * bytes with the JDK's `javax.sound.sampled` into per-second windows
  * of exact mean amplitude. Video decode is REAL for the one
  * multi-frame container the JDK ships a codec for: [[GifCodec]]
  * frame-samples animated GIFs through `javax.imageio`'s GIF reader.
  * Other video containers (mp4/webm — no JDK codec) fall back to the
  * deterministic [[StubCodec]] fake keyed on the content hash;
  * swapping in a production codec changes only the body of
  * `MediaCodec.decode` — the pipeline shape is fixed.
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

  /** Real image decode on the JDK's built-in `javax.imageio` readers
    * (PNG/JPEG/GIF/BMP). One frame per image:
    * `[width, height, channels, meanR, meanG, meanB]` — the means are
    * computed over the sRGB int raster with exact integer sums, so a
    * losslessly-encoded image decodes to analytically predictable
    * values (the mm_decode oracle recomputes them from first
    * principles). Undecodable bytes emit NO frame rather than a fake
    * one — at 100 TB a corrupt blob must drop out of the feature
    * table, not poison it. Non-image modalities delegate to
    * [[StubCodec]] (no JDK audio/video codec exists). */
  object ImageIoCodec extends MediaCodec {
    def decode(asset: MediaAsset, maxFrames: Int): Seq[Array[Float]] =
      if (asset.modality != "image") StubCodec.decode(asset, maxFrames)
      else try {
        javax.imageio.ImageIO.setUseCache(false) // no temp files on executors
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(asset.content))
        if (img == null) Seq.empty
        else {
          val w = img.getWidth
          val h = img.getHeight
          val channels = img.getColorModel.getNumComponents
          // one bulk sRGB conversion, then exact integer channel sums
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sr += (p >> 16) & 0xff
            sg += (p >> 8) & 0xff
            sb += p & 0xff
            i += 1
          }
          val n = w.toLong * h
          Seq(Array(w.toFloat, h.toFloat, channels.toFloat,
            (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
            (sb.toDouble / n).toFloat))
        }
      } catch {
        // a truncated/corrupt image whose header a reader DOES
        // recognize makes ImageIO.read throw IIOException instead of
        // returning null — same drop-don't-poison contract
        case _: java.io.IOException
           | _: IllegalArgumentException => Seq.empty
      }
  }

  /** Real audio decode on the JDK's built-in `javax.sound.sampled`
    * WAV/PCM reader. Any PCM-representable input is normalized to
    * 16-bit signed little-endian at its native rate/channel count,
    * then windowed into one-second frames (capped at `maxFrames`):
    * `[sample_rate, channels, samples_in_window, mean_amplitude]`,
    * the mean computed with exact integer sums over the interleaved
    * 16-bit samples — so a losslessly-encoded fixture decodes to
    * analytically predictable values (the mm_audio_decode oracle
    * recomputes them from first principles). Undecodable bytes emit
    * NO frame (same drop-don't-poison stance as [[ImageIoCodec]]).
    * Non-audio modalities delegate to [[ImageIoCodec]] — chaining the
    * two gives one codec that is real for image+audio and stubbed
    * only for video. */
  object WavCodec extends MediaCodec {
    def decode(asset: MediaAsset, maxFrames: Int): Seq[Array[Float]] =
      if (asset.modality != "audio") ImageIoCodec.decode(asset, maxFrames)
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(asset.content))
        try {
          val base = in.getFormat
          val fmt = new javax.sound.sampled.AudioFormat(
            base.getSampleRate, 16, base.getChannels,
            /* signed = */ true, /* bigEndian = */ false)
          val pcm =
            if (base.matches(fmt)) in
            else javax.sound.sampled.AudioSystem.getAudioInputStream(fmt, in)
          val bytes = pcm.readAllBytes()
          val rate = fmt.getSampleRate.toInt
          val channels = fmt.getChannels
          val total = bytes.length / 2 // interleaved 16-bit samples
          val perWindow = rate * channels // one-second windows
          if (total == 0 || perWindow <= 0) Seq.empty
          else {
            val nWin = math.min(maxFrames.toLong,
              (total.toLong + perWindow - 1) / perWindow).toInt
            (0 until nWin).map { k =>
              val lo = k * perWindow
              val hi = math.min(total, lo + perWindow)
              var sum = 0L
              var s = lo
              while (s < hi) {
                // little-endian signed 16-bit: high byte keeps its sign
                sum += (bytes(2 * s + 1).toInt << 8) | (bytes(2 * s) & 0xff)
                s += 1
              }
              Array(rate.toFloat, channels.toFloat, (hi - lo).toFloat,
                (sum.toDouble / (hi - lo)).toFloat)
            }
          }
        } finally in.close()
      } catch {
        // IllegalArgumentException: AudioSystem throws it for a valid
        // file whose encoding has no PCM16 conversion path — that
        // asset must drop out like any other undecodable one
        case _: javax.sound.sampled.UnsupportedAudioFileException
           | _: java.io.IOException
           | _: IllegalArgumentException => Seq.empty
      }
  }

  /** Real video-frame decode for animated GIF — the one multi-frame
    * container `javax.imageio` can read out of the box. Frames are
    * sampled EVENLY across the animation (index `⌊j·n/maxFrames⌋` for
    * `j < min(n, maxFrames)` — the standard fixed-budget frame-sample
    * a video pipeline runs, not "first k"), each decoded to
    * `[width, height, total_frames, meanR, meanG, meanB]` with the
    * same exact integer channel sums as [[ImageIoCodec]]. GIF is
    * palette-based and lossless, so solid-color fixture frames decode
    * to analytically predictable means. Undecodable bytes emit NO
    * frame; non-GIF video bytes have no JDK codec and also emit none
    * (a production deployment swaps in mp4/webm here). Non-video
    * modalities delegate to [[WavCodec]] → [[ImageIoCodec]], so this
    * is the fully-real codec for all three modalities. */
  object GifCodec extends MediaCodec {
    def decode(asset: MediaAsset, maxFrames: Int): Seq[Array[Float]] =
      if (asset.modality != "video") WavCodec.decode(asset, maxFrames)
      else try {
        javax.imageio.ImageIO.setUseCache(false)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(asset.content))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Seq.empty
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, /* seekForwardOnly = */ false)
              val n = reader.getNumImages(/* allowSearch = */ true)
              val picks = math.min(n, maxFrames)
              (0 until picks).map { j =>
                val idx = (j.toLong * n / picks).toInt
                val img = reader.read(idx)
                val w = img.getWidth
                val h = img.getHeight
                val px = img.getRGB(0, 0, w, h, null, 0, w)
                var sr = 0L; var sg = 0L; var sb = 0L
                var i = 0
                while (i < px.length) {
                  val p = px(i)
                  sr += (p >> 16) & 0xff
                  sg += (p >> 8) & 0xff
                  sb += p & 0xff
                  i += 1
                }
                val cnt = w.toLong * h
                Array(w.toFloat, h.toFloat, n.toFloat,
                  (sr.toDouble / cnt).toFloat, (sg.toDouble / cnt).toFloat,
                  (sb.toDouble / cnt).toFloat)
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch {
        // a malformed container can also surface as IIOException's
        // unchecked cousins from deep in the reader — drop, don't
        // poison the partition
        case _: java.io.IOException
           | _: IllegalArgumentException
           | _: IndexOutOfBoundsException => Seq.empty
      }
  }

  /** Mime-keyed codec registry — the CONTRACTUAL mp4/webm boundary:
    * a production deployment registers a codec per container format
    * (e.g. `"video/mp4" → <FFmpeg-backed MediaCodec>`) and the same
    * partition-iterator decode path ([[decodeAndFeaturize]])
    * dispatches per asset; unregistered mime types fall back to the
    * JDK chain ([[GifCodec]] → [[WavCodec]] → [[ImageIoCodec]] →
    * [[StubCodec]]). The 100 TB decode story therefore depends only
    * on this registration point, never on JDK-shipped formats —
    * PipelineSpec pins that a synthetic registered codec slots in
    * with zero pipeline changes. */
  final case class CodecRegistry(entries: Map[String, MediaCodec],
      fallback: MediaCodec = GifCodec) extends MediaCodec {
    def decode(asset: MediaAsset, maxFrames: Int): Seq[Array[Float]] =
      entries.getOrElse(asset.mime_type, fallback)
        .decode(asset, maxFrames)
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

  /** Real pixel resize: decode with `javax.imageio`, scale through a
    * `Graphics2D` bilinear draw, re-encode as PNG (lossless, so a
    * solid-color input resizes to exactly the same color — the
    * mm_resize_decode oracle leans on that invariant). Undecodable
    * bytes pass through unchanged (same drop-don't-poison stance as
    * [[ImageIoCodec]]; the downstream decode emits no frame for
    * them). */
  object ImageIoResizer extends MediaResizer {
    def resize(a: MediaAsset, w: Int, h: Int): MediaAsset = try {
      javax.imageio.ImageIO.setUseCache(false)
      val src = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(a.content))
      if (src == null) a
      else {
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        a.copy(width = Some(w), height = Some(h),
          content = out.toByteArray, mime_type = "image/png")
      }
    } catch {
      // truncated-but-recognized bytes throw from ImageIO.read rather
      // than returning null — same pass-through as the null path
      case _: java.io.IOException | _: IllegalArgumentException => a
    }
  }

  /** Partition-iterator resize pass over image assets; non-image rows
    * pass through untouched. Same single-boundary shape as
    * [[decodeAndFeaturize]]: swap the resizer, keep the plan. */
  def resizeImages(assets: Dataset[MediaAsset], w: Int, h: Int,
      resizer: MediaResizer = StubResizer): Dataset[MediaAsset] = {
    // caller bug, not a poison asset — must fail here, not be
    // swallowed by the per-asset decode guards into a silent no-op
    require(w > 0 && h > 0, s"resizeImages: target ${w}x$h must be > 0")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.modality == "image") resizer.resize(a, w, h) else a
      }
    }
  }

  // --- perceptual image hashing (dHash) ---------------------------

  /** 64-bit difference hash of an image, as 4×16-bit parts (the
    * [[graft.pipeline.Dedup]] SimHash banding convention — parts are
    * non-negative, so no 1<<63 sign traps on either engine). The
    * image is bilinear-resized to 9×8 unless already that size (the
    * analytic fixtures are native 9×8, so their decode is
    * resampling-free and bit-predictable), converted to integer luma
    * `(77R + 150G + 29B) >> 8` (exact identity on gray pixels), and
    * bit `y·8+x` is set iff luma strictly increases from column x to
    * x+1 — brightness- and contrast-shift invariant by construction,
    * which is what makes it a NEAR-dup signature rather than an exact
    * hash. Undecodable bytes → None (drop-don't-poison). */
  def dHashParts(content: Array[Byte]): Option[Array[Long]] = try {
    javax.imageio.ImageIO.setUseCache(false)
    val raw = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(content))
    if (raw == null) None
    else {
      val img =
        if (raw.getWidth == 9 && raw.getHeight == 8) raw
        else {
          val dst = new java.awt.image.BufferedImage(
            9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(raw, 0, 0, 9, 8, null)
          } finally g.dispose()
          dst
        }
      val px = img.getRGB(0, 0, 9, 8, null, 0, 9)
      def luma(p: Int): Int =
        (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) +
          29 * (p & 0xff)) >> 8
      val parts = new Array[Long](4)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (luma(px(y * 9 + x + 1)) > luma(px(y * 9 + x))) {
            val pos = y * 8 + x
            parts(pos / 16) |= 1L << (pos % 16)
          }
          x += 1
        }
        y += 1
      }
      Some(parts)
    }
  } catch {
    case _: java.io.IOException | _: IllegalArgumentException => None
  }

  /** Deterministic 9×8 grayscale PNG whose dHash is ANALYTICALLY
    * known (the mm_dhash oracle recomputes it from `range()` alone):
    * group `g = i mod 6` defines the bit pattern
    * `b(x,y) = ((3x + 5y + 7g) mod 8) < 4`; pixels follow the
    * cumulative walk `v(0,y) = 100 + (i div 6 mod 4)·10`,
    * `v(x+1,y) = v(x,y) ± 2` (+ iff the bit is set), so the hash
    * ignores the per-image base brightness — same-group images are
    * brightness-shifted near-dups with IDENTICAL hashes. The fourth
    * group member (`i ≥ 18`) additionally flips the single step at
    * position `i mod 64`, making it a Hamming-1 near-dup (exercises
    * banded recall below the exact-match radius). */
  def fixtureDHashPng(i: Long): Array[Byte] = {
    val g = (i % 6).toInt
    val base = 100 + ((i / 6) % 4).toInt * 10
    val flip = if (i >= 18) (i % 64).toInt else -1
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var v = base
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      var x = 0
      while (x < 8) {
        val pos = y * 8 + x
        var bit = ((3 * x + 5 * y + 7 * g) % 8) < 4
        if (pos == flip) bit = !bit
        v = if (bit) v + 2 else v - 2
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    javax.imageio.ImageIO.setUseCache(false)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** `n` dHash fixture assets, encoded distributed. */
  def dhashAssets(spark: SparkSession, n: Int): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { i =>
        MediaAsset(i, "image", fixtureDHashPng(i), "image/png",
          Some(9), Some(8), None, None)
      }
    }
  }

  /** Real-decode dHash signature table over [[dhashAssets]]:
    * `(asset_id, part, sig)`, 4 rows per image. */
  def dHashTable(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    dhashAssets(spark, n).mapPartitions { it =>
      it.flatMap { a =>
        dHashParts(a.content).toSeq.flatMap { parts =>
          parts.zipWithIndex.map { case (sig, k) =>
            (a.asset_id, k, sig)
          }
        }
      }
    }.toDF("asset_id", "part", "sig")
  }

  /** Near-duplicate image pairs from a dHash signature relation
    * (`asset_id, part, sig`): banded candidate generation — an
    * equi-join on (part, sig), the Manku pigeonhole, complete for
    * Hamming ≤ 3 over 4 bands — then EXACT Hamming verification on
    * the candidates only. Never an all-pairs comparison: at 100 TB
    * the band join is bucket-local and the verify set is
    * candidate-sized. */
  def dHashPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"dHashPairs: 4×16-bit banding is complete only to Hamming 3, got $maxHamming")
    val cands = sigs.alias("a")
      .join(sigs.alias("b"),
        col("a.part") === col("b.part") &&
          col("a.sig") === col("b.sig") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id_a"),
        col("b.asset_id").as("id_b"))
      .distinct()
    cands
      .join(sigs.alias("x"), col("id_a") === col("x.asset_id"))
      .join(sigs.alias("y"),
        col("id_b") === col("y.asset_id") &&
          col("x.part") === col("y.part"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(expr("bit_count(x.sig ^ y.sig)")).cast("int")
        .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id_a"), col("id_b"))
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

  /** Deterministic PNG fixture for asset `i` with ANALYTICALLY known
    * pixel statistics: dimensions `w = 16 + (i mod 8) * 4`,
    * `h = 12 + (i mod 5) * 4`; every third asset is a horizontal
    * gradient (pixel value = column index on all three channels, so
    * each channel mean is exactly `(w-1)/2`), the rest are solid
    * `rgb((37i) mod 256, (59i) mod 256, (83i) mod 256)` (each channel
    * mean is exactly its component). PNG is lossless, so the decoded
    * means match the formulas bit-for-bit — which is what lets a
    * DuckDB oracle verify a REAL image decode from `range()` alone. */
  def fixturePng(i: Long): (Int, Int, Array[Byte]) = {
    val w = 16 + (i % 8).toInt * 4
    val h = 12 + (i % 5).toInt * 4
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb =
          if (i % 3 == 0) (x << 16) | (x << 8) | x
          else {
            val r = (37 * i % 256).toInt
            val g = (59 * i % 256).toInt
            val b = (83 * i % 256).toInt
            (r << 16) | (g << 8) | b
          }
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    javax.imageio.ImageIO.setUseCache(false)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    (w, h, out.toByteArray)
  }

  /** `n` real PNG assets, encoded DISTRIBUTED (one task per range
    * partition, encoder state amortized per partition — the same
    * boundary discipline as [[decodeAndFeaturize]]). */
  def imageAssets(spark: SparkSession, n: Int): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { i =>
        val (w, h, bytes) = fixturePng(i)
        MediaAsset(i, "image", bytes, "image/png",
          Some(w), Some(h), None, None)
      }
    }
  }

  /** Real-decode feature table over [[imageAssets]]: PNG bytes →
    * [[ImageIoCodec]] → one row per image with decoded dimensions,
    * channel count, and exact per-channel means. Deterministic output
    * (total order on asset_id). */
  def decodeTable(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    decodeAndFeaturize(imageAssets(spark, n), ImageIoCodec).toDF()
      .select(col("asset_id"),
        element_at(col("feature"), 1).cast("int").as("width"),
        element_at(col("feature"), 2).cast("int").as("height"),
        element_at(col("feature"), 3).cast("int").as("channels"),
        element_at(col("feature"), 4).cast("double").as("mean_r"),
        element_at(col("feature"), 5).cast("double").as("mean_g"),
        element_at(col("feature"), 6).cast("double").as("mean_b"))
      .orderBy(col("asset_id"))
  }

  /** Deterministic 16-bit PCM WAV fixture for asset `i` with
    * ANALYTICALLY known sample statistics: 8 kHz,
    * `channels = 1 + (i mod 2)`, `seconds = 1 + (i mod 3)`; every
    * interleaved sample in one-second window `k` (all channels) holds
    * the constant `((31i + 17k) mod 200 − 100) · 100`, so each
    * window's mean amplitude is exactly that value. WAV PCM is
    * lossless, so the decoded means match the formulas bit-for-bit —
    * which is what lets a DuckDB oracle verify a REAL audio decode
    * from `range()` alone. Returns (channels, seconds, wavBytes). */
  def fixtureWav(i: Long): (Int, Int, Array[Byte]) = {
    val rate = 8000
    val channels = 1 + (i % 2).toInt
    val seconds = 1 + (i % 3).toInt
    val pcm = new Array[Byte](rate * seconds * channels * 2)
    var off = 0
    var k = 0
    while (k < seconds) {
      val amp = (((31 * i + 17 * k) % 200) - 100).toInt * 100
      var s = 0
      while (s < rate * channels) {
        pcm(off) = (amp & 0xff).toByte
        pcm(off + 1) = ((amp >> 8) & 0xff).toByte
        off += 2
        s += 1
      }
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, (rate * seconds).toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    (channels, seconds, out.toByteArray)
  }

  /** `n` real WAV assets, encoded DISTRIBUTED (same per-partition
    * boundary discipline as [[imageAssets]]). */
  def audioAssets(spark: SparkSession, n: Int): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { i =>
        val (channels, seconds, bytes) = fixtureWav(i)
        MediaAsset(i, "audio", bytes, "audio/wav",
          None, None, Some(8000), Some(seconds * 1000L))
      }
    }
  }

  /** Real-decode feature table over [[audioAssets]]: WAV bytes →
    * [[WavCodec]] → one row per one-second window with the decoded
    * rate, channel count, window size, and exact mean amplitude.
    * Deterministic output (total order on asset_id, frame_index). */
  def audioDecodeTable(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    decodeAndFeaturize(audioAssets(spark, n), WavCodec).toDF()
      .select(col("asset_id"), col("frame_index"),
        element_at(col("feature"), 1).cast("int").as("sample_rate"),
        element_at(col("feature"), 2).cast("int").as("channels"),
        element_at(col("feature"), 3).cast("int").as("n_samples"),
        element_at(col("feature"), 4).cast("double").as("mean_amp"))
      .orderBy(col("asset_id"), col("frame_index"))
  }

  /** Deterministic animated-GIF fixture for asset `i` with
    * ANALYTICALLY known per-frame statistics: dimensions
    * `w = 16 + (i mod 4) · 4`, `h = 12 + (i mod 3) · 4`,
    * `frames = 1 + (i mod 4)`, frame `k` solid
    * `rgb((29i+11k) mod 256, (53i+7k) mod 256, (71i+13k) mod 256)`.
    * GIF's palette encoding is lossless for ≤256 distinct colors, so
    * each decoded frame's channel means equal its generator color
    * exactly — a DuckDB oracle can verify a REAL multi-frame video
    * decode from `range()` alone. Returns (w, h, frames, gifBytes). */
  def fixtureGif(i: Long): (Int, Int, Int, Array[Byte]) = {
    val w = 16 + (i % 4).toInt * 4
    val h = 12 + (i % 3).toInt * 4
    val frames = 1 + (i % 4).toInt
    javax.imageio.ImageIO.setUseCache(false)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var k = 0
      while (k < frames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val r = ((29 * i + 11 * k) % 256).toInt
        val g = ((53 * i + 7 * k) % 256).toInt
        val b = ((71 * i + 13 * k) % 256).toInt
        val gr = img.createGraphics()
        try {
          gr.setColor(new java.awt.Color(r, g, b))
          gr.fillRect(0, 0, w, h)
        } finally gr.dispose()
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        k += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    (w, h, frames, out.toByteArray)
  }

  /** `n` real animated-GIF assets, encoded DISTRIBUTED (same
    * per-partition boundary discipline as [[imageAssets]]). */
  def videoAssets(spark: SparkSession, n: Int): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { i =>
        val (w, h, frames, bytes) = fixtureGif(i)
        MediaAsset(i, "video", bytes, "image/gif",
          Some(w), Some(h), None, Some(frames * 100L))
      }
    }
  }

  /** Real-decode feature table over [[videoAssets]]: GIF bytes →
    * [[GifCodec]] → one row per sampled frame with decoded dims,
    * total frame count, and exact per-channel means. Deterministic
    * output (total order on asset_id, frame_index). */
  def videoDecodeTable(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    decodeAndFeaturize(videoAssets(spark, n), GifCodec).toDF()
      .select(col("asset_id"), col("frame_index"),
        element_at(col("feature"), 1).cast("int").as("width"),
        element_at(col("feature"), 2).cast("int").as("height"),
        element_at(col("feature"), 3).cast("int").as("n_frames"),
        element_at(col("feature"), 4).cast("double").as("mean_r"),
        element_at(col("feature"), 5).cast("double").as("mean_g"),
        element_at(col("feature"), 6).cast("double").as("mean_b"))
      .orderBy(col("asset_id"), col("frame_index"))
  }

  /** Real resize proof: solid-color assets → [[ImageIoResizer]] to
    * `(w, h)` → [[ImageIoCodec]] decode of the re-encoded bytes.
    * Solid colors survive any interpolation exactly, so the decoded
    * means must still equal the generator formulas while the decoded
    * dimensions become the resize targets. Gradient assets (i%3==0)
    * are excluded — their resized means depend on the interpolator,
    * which is not part of the contract. */
  def resizeDecodeTable(spark: SparkSession, n: Int,
      w: Int, h: Int): DataFrame = {
    import spark.implicits._
    val solid = imageAssets(spark, n).filter(_.asset_id % 3 != 0)
    decodeAndFeaturize(resizeImages(solid, w, h, ImageIoResizer),
        ImageIoCodec).toDF()
      .select(col("asset_id"),
        element_at(col("feature"), 1).cast("int").as("width"),
        element_at(col("feature"), 2).cast("int").as("height"),
        element_at(col("feature"), 4).cast("double").as("mean_r"),
        element_at(col("feature"), 5).cast("double").as("mean_g"),
        element_at(col("feature"), 6).cast("double").as("mean_b"))
      .orderBy(col("asset_id"))
  }
}
