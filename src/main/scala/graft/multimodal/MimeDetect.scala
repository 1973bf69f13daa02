package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-type detection + per-format metadata extraction — the
  * Tika-shaped operator (reference: TikaMetadataProducer,
  * participants/implementations.kt:215-240, which detects the document
  * type and emits its metadata map). Offline and columnar: mime is
  * sniffed from magic bytes, and each detected format's HEADER is parsed
  * with codegen'd expressions — PNG dimensions straight from the IHDR
  * chunk, WAV rate/duration from the RIFF header, GRFT version/length
  * from its fixed offsets. No library, no per-row JVM call; content
  * bytes never leave the executors.
  *
  * Detection table (first match wins, like Tika's magic registry):
  *   \x89PNG\r\n\x1a\n        → image/png
  *   RIFF....WAVE             → audio/wav
  *   GRFT                     → application/x-grft
  *   PK\x03\x04               → application/zip (docx and friends)
  *   %PDF-                    → application/pdf
  *   GRAV\x01                 → video/x-grav (the PNG-frame container)
  *   otherwise                → text/plain (the corpus default)
  */
object MimeDetect {

  /** Adds `mime` plus per-format metadata columns (null where not
    * applicable): width/height (png), sample_rate/duration_ms (wav),
    * version/payload_bytes (grft), zip_entries (zip — total entry count
    * from the end-of-central-directory record, parsed columnar off the
    * archive TAIL; null when the EOCD carries a comment), n_bytes (all). */
  def detected(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val c = contentCol
    def be32(pos1: Int): String =
      s"cast(conv(hex(substring($c, $pos1, 4)), 16, 10) as bigint)"
    def le16(pos1: Int): String =
      s"(cast(conv(hex(substring($c, ${pos1 + 1}, 1)), 16, 10) as bigint) * 256 + " +
        s"cast(conv(hex(substring($c, $pos1, 1)), 16, 10) as bigint))"
    def le32(pos1: Int): String = s"(${le16(pos1 + 2)}) * 65536 + (${le16(pos1)})"

    df
      .withColumn("mime",
        when(expr(s"substring($c, 1, 8) = X'89504E470D0A1A0A'"), lit("image/png"))
          .when(expr(s"substring($c, 1, 4) = cast('RIFF' as binary) and " +
            s"substring($c, 9, 4) = cast('WAVE' as binary)"), lit("audio/wav"))
          .when(expr(s"substring($c, 1, 4) = cast('GRFT' as binary)"),
            lit("application/x-grft"))
          .when(expr(s"substring($c, 1, 4) = X'504B0304'"), lit("application/zip"))
          .when(expr(s"substring($c, 1, 5) = cast('%PDF-' as binary)"),
            lit("application/pdf"))
          .when(expr(s"substring($c, 1, 5) = X'4752415601'"),
            lit("video/x-grav"))
          .otherwise(lit("text/plain")))
      .withColumn("n_bytes", expr(s"length($c)").cast("long"))
      // PNG: IHDR is always the first chunk — width/height are the two
      // big-endian 32-bit words right after the 8-byte signature + 8-byte
      // chunk header (bytes 17-20, 21-24, 1-based)
      .withColumn("width",
        when(col("mime") === "image/png", expr(be32(17))))
      .withColumn("height",
        when(col("mime") === "image/png", expr(be32(21))))
      // WAV: rate at 25-28 LE; duration from the data-size field at 41-44
      .withColumn("sample_rate",
        when(col("mime") === "audio/wav", expr(le32(25))))
      .withColumn("duration_ms",
        // nullif guards a malformed zero rate field: duration null, not a
        // division-by-zero error killing the whole scan under ANSI
        when(col("mime") === "audio/wav",
          expr(s"((${le32(41)}) div 2) * 1000 div nullif(${le32(25)}, 0)")))
      // GRFT: version byte 5, payload length 6-9 BE
      .withColumn("version",
        when(col("mime") === "application/x-grft",
          expr(s"cast(conv(hex(substring($c, 5, 1)), 16, 10) as bigint)")))
      .withColumn("payload_bytes",
        when(col("mime") === "application/x-grft", expr(be32(6))))
      // ZIP: total entry count from the comment-free end-of-central-
      // directory record — fixed 22-byte tail, magic PK\x05\x06, entry
      // total at EOCD offset 10 (LE16). All positions are expressions of
      // length(c), still fully codegen'd.
      .withColumn("zip_entries",
        when(col("mime") === "application/zip" &&
          expr(s"length($c) >= 22 and substring($c, length($c) - 21, 4) = X'504B0506'"),
          expr(s"cast(conv(hex(substring($c, length($c) - 10, 1)), 16, 10) as bigint) * 256 + " +
            s"cast(conv(hex(substring($c, length($c) - 11, 1)), 16, 10) as bigint)")))
      // PDF: the header version digits right after the %PDF- magic
      .withColumn("pdf_version",
        when(col("mime") === "application/pdf",
          expr(s"cast(substring($c, 6, 3) as string)")))
      // GRAV: frame count at 6-9 BE, fps at 10-13 BE → duration
      .withColumn("video_frames",
        when(col("mime") === "video/x-grav", expr(be32(6))))
      .withColumn("video_duration_ms",
        when(col("mime") === "video/x-grav",
          expr(s"${be32(6)} * 1000 div nullif(${be32(10)}, 0)")))
  }
}
