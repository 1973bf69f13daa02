package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north-star): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus
  * partition-batched feature extraction.
  *
  * The Spark-side mechanics — schema, encoders, partition batching, UDF
  * signature — are real and tested; the codec itself is STUBBED behind
  * `MediaDecoder` because no image/audio libraries exist in this
  * container. A production deployment swaps `DeterministicFakeDecoder`
  * for a JNI/javacv-backed implementation without touching the plumbing.
  *
  * Scale notes: media rows are large (MBs); keep
  * `spark.sql.files.maxPartitionBytes` sized so one partition holds a few
  * hundred rows, and never collect payloads. Feature extraction is
  * `mapPartitions` so decoder init (model load, codec contexts) amortizes
  * per partition, mirroring how the reference builds Tika/CoreNLP once
  * per participant (reference: participants/implementations.kt:64, 99).
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
      content_hash: Long, feature: Array[Float])

  /** Pluggable decode step. Implementations MUST be deterministic given
    * the payload (the pipeline replays idempotently, like every reference
    * participant). */
  trait MediaDecoder extends Serializable {
    def features(payload: Array[Byte], meta: MediaMeta): Array[Float]
  }

  /** STUB decoder: a real deployment replaces this with an actual codec.
    * Produces a deterministic 8-dim "embedding" from byte statistics so
    * tests exercise the full plumbing (schema, batching, downstream
    * similarity ops) with stable values. */
  object DeterministicFakeDecoder extends MediaDecoder {
    override def features(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
      val f = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        f(i % 8) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      f
    }
  }

  /** Build a media table from any (id, text) frame by treating the UTF-8
    * bytes as the opaque payload — the shape a binaryFile/object-store
    * source produces. */
  def syntheticMediaFrom(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        lit(0).as("width"), lit(0).as("height"),
        length(col(textCol)).cast("long").as("durationMs")).as("meta"))

  /** Partition-batched feature extraction: one decoder instance per
    * partition, rows streamed through it (never materialized wholesale). */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // decoder init happens here, once per partition
      it.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          mime = r.meta.mime,
          n_bytes = r.payload.length.toLong,
          content_hash = scala.util.hashing.MurmurHash3.bytesHash(r.payload).toLong,
          feature = decoder.features(r.payload, r.meta))
      }
    }
  }

  /** Transcode step shape: payload → payload with updated metadata. The
    * codec is STUBBED (no image/audio libs in this container); the Spark
    * plumbing — typed map, metadata propagation, partition batching — is
    * real. A real `resize` swaps `transform` for an imaging call. */
  trait MediaTransform extends Serializable {
    def name: String
    def transform(payload: Array[Byte], meta: MediaMeta): (Array[Byte], MediaMeta)
  }

  /** STUB resize: marks the metadata with the target box and truncates the
    * payload deterministically (stand-in for a real scaled re-encode). */
  class StubResize(maxW: Int, maxH: Int) extends MediaTransform {
    override def name: String = s"resize-${maxW}x$maxH"
    override def transform(payload: Array[Byte], meta: MediaMeta): (Array[Byte], MediaMeta) = {
      val scale = math.min(1.0, maxW.toDouble / math.max(1, meta.width max 1))
      val keep = math.max(1, (payload.length * scale).toInt)
      (payload.take(keep), meta.copy(width = maxW min (meta.width max 1), height = maxH min (meta.height max 1)))
    }
  }

  /** STUB frame sampling: every `stride`-th byte window as a "frame" —
    * the shape (1 media row → N frame rows with ordinals) is the real
    * part; a real sampler decodes the container instead. */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int,
      frameBytes: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      r.payload.grouped(stride).zipWithIndex.map { case (window, i) =>
        (r.media_id, i.toLong, window.take(frameBytes), r.meta.mime)
      }
    }.toDF("media_id", "frame_idx", "frame", "mime")
  }

  def applyTransform(spark: SparkSession, media: DataFrame,
      t: MediaTransform): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val (p2, m2) = t.transform(r.payload, r.meta)
        MediaRecord(r.media_id, p2, m2)
      }
    }.toDF()
  }

  // ------------------------------------------------- REAL image codec

  /** REAL image path — `javax.imageio` ships IN the JDK, so PNG
    * decode/encode and resize run through an actual lossless codec even
    * in this no-external-libs container; only exotic media (video
    * containers, audio codecs) stay behind the stub decoder. Everything
    * here is deterministic: PNG round-trips pixel-exact, and the resize
    * uses nearest-neighbour AffineTransformOp (integer sampling — no
    * renderer-dependent filtering). */
  object ImageCodec extends MediaDecoder {

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }

    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

    /** 8×8 RGB test-pattern for `id`: channel values are closed-form
      * integer functions of (id, x, y), so an independent engine can
      * compute any decoded-pixel statistic WITHOUT a codec — which is
      * what lets a SQL oracle gate a real encode→decode round-trip. */
    def syntheticPng(id: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val r = (((id % 1009) * 31 + x * 7 + y * 13) % 256).toInt
          val g = (((id % 1013) * 17 + x * 11 + y * 3) % 256).toInt
          val b = (((id % 997) * 23 + x * 5 + y * 19) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** Integer-exact decoded statistics: (width, height, Σr, Σg, Σb). */
    def channelSums(bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
      val img = decode(bytes)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          x += 1
        }
        y += 1
      }
      (img.getWidth, img.getHeight, sr, sg, sb)
    }

    /** MediaDecoder over real PNGs: [w, h, meanR, meanG, meanB]. */
    override def features(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
      val (w, h, sr, sg, sb) = channelSums(payload)
      val n = (w.toLong * h).toFloat
      Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n)
    }
  }

  /** REAL resize: decode → nearest-neighbour scale into the target box
    * (aspect preserved) → PNG re-encode. Deterministic integer pixel
    * sampling; swaps in for StubResize wherever a MediaTransform goes. */
  class PngResize(maxW: Int, maxH: Int) extends MediaTransform {
    override def name: String = s"png-resize-${maxW}x$maxH"
    override def transform(payload: Array[Byte], meta: MediaMeta): (Array[Byte], MediaMeta) = {
      val img = ImageCodec.decode(payload)
      val scale = math.min(1.0,
        math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
      val (w2, h2) = (math.max(1, (img.getWidth * scale).toInt),
        math.max(1, (img.getHeight * scale).toInt))
      // hand-rolled integer nearest-neighbour sampling (AffineTransformOp
      // is renderer-dependent and refuses some src/dst type pairs; this is
      // exact integer math, identical on any JVM)
      val out = new java.awt.image.BufferedImage(w2, h2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          out.setRGB(x, y, img.getRGB(x * img.getWidth / w2, y * img.getHeight / h2))
          x += 1
        }
        y += 1
      }
      (ImageCodec.encodePng(out), meta.copy(width = w2, height = h2))
    }
  }
}
