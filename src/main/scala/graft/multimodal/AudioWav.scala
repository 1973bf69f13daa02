package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL audio path — RIFF/WAVE PCM is a fixed-offset binary format, so
  * the decode step runs COLUMNAR (substring/hex/conv + higher-order
  * aggregate over the sample words), no codec library at all: header
  * fields validate/extract with codegen'd expressions, and per-sample
  * statistics (sum |s|, peak |s|) fold over the data section in one
  * expression. Together with ImageCodec (real PNG) this leaves only
  * video containers in the stub tier.
  *
  * Scale note: the per-sample fold is a higher-order lambda (interpreted
  * per element) — right for clip-level stats over short clips and for
  * the oracle-gated correctness query; a production deployment decoding
  * hours of audio would hoist the same loop into a native kernel or a
  * mapPartitions decoder (Multimodal.MediaDecoder seam), identical
  * semantics.
  */
object AudioWav {

  val HeaderLen = 44
  val SampleRate = 8000

  /** Canonical PCM mono 16-bit WAV writer (JVM side — fixtures and any
    * single-record producer). The columnar parser below must invert the
    * header and samples exactly. */
  def encode(samples: Array[Short], sampleRate: Int = SampleRate): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(HeaderLen + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2)  // block align
    bb.putShort(16) // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Deterministic test clip for `id`: n = 32 + id % 32 samples with
    * s_i = ((id·97 + i·31) mod 2048) − 1024 — closed-form, so an
    * independent engine computes any clip statistic without a decoder. */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = (32 + id % 32).toInt
    encode(Array.tabulate(n)(i => (((id * 97 + i * 31) % 2048) - 1024).toShort))
  }

  /** 64-bit DELTA-SIGN fingerprint over a parsed clip: bit i is set iff
    * sample i+1 > sample i (signed LE16 compare), for i < min(n−1, 64).
    * The audio analogue of the image aHash — invariant to amplitude
    * scaling direction changes are what survive re-encoding — and, like
    * every multimodal signature here, closed-form replayable: an
    * independent engine computes each bit from the clip formula without
    * a decoder. Must run on [[parsed]] output (needs `n_samples`); yields
    * null for clips with a `wav_error`. Map-only, one pass per clip. */
  def deltaFingerprint(contentCol: String = "content"): org.apache.spark.sql.Column = {
    val s = sampleSigned(contentCol, "i")
    val sNext = sampleSigned(contentCol, "(i + 1)")
    when(col("wav_error").isNull, expr(
      s"case when n_samples >= 2 then " +
        s"aggregate(sequence(0, least(cast(n_samples as int) - 2, 63)), 0L, " +
        s"(acc, i) -> acc + (case when $sNext > $s then shiftleft(1L, cast(i as int)) else 0L end)) " +
        "else 0L end"))
  }

  /** Signed 16-bit LE sample at 0-based index `iExpr` (SQL fragment). */
  private def sampleSigned(c: String, iExpr: String): String = {
    val hi = s"cast(conv(hex(substring($c, 46 + 2 * $iExpr, 1)), 16, 10) as bigint)"
    val lo = s"cast(conv(hex(substring($c, 45 + 2 * $iExpr, 1)), 16, 10) as bigint)"
    val sample = s"($hi * 256 + $lo)"
    s"(case when $sample >= 32768 then $sample - 65536 else $sample end)"
  }

  private def le16(c: String, pos1: Int): String =
    s"cast(conv(hex(substring($c, ${pos1 + 1}, 1)), 16, 10) as bigint) * 256 + " +
      s"cast(conv(hex(substring($c, $pos1, 1)), 16, 10) as bigint)"

  private def le32(c: String, pos1: Int): String =
    s"(${le16(c, pos1 + 2)}) * 65536 + (${le16(c, pos1)})"

  /** Columnar WAV parse of `contentCol` (binary). Adds:
    *   wav_error    — null when valid, else bad-riff | bad-fmt | bad-length
    *   sample_rate, n_samples, duration_ms — header-derived (exact ints)
    *   sum_abs, peak_abs — per-sample fold over the PCM words (signed
    *                 16-bit LE, |·| folded with integer arithmetic)
    *
    * The header stays pure-columnar in both modes. The per-sample fold
    * defaults to the native one-pass kernel
    * (NativeExpressions.WavSampleStats — a tight byte loop);
    * `nativeSampleFold = false` keeps the all-expression higher-order
    * aggregate form (every stat derivable by ANY engine from the same
    * bytes — the form the q74 oracle replays conceptually). Both forms
    * are asserted identical in MultimodalSpec. */
  def parsed(df: DataFrame, contentCol: String = "content",
      nativeSampleFold: Boolean = true): DataFrame = {
    val c = contentCol
    // signed LE16 sample i (0-based) at byte offset 44 + 2i (1-based 45)
    val signed = sampleSigned(c, "i")
    df
      .withColumn("__riff_ok", expr(
        s"substring($c, 1, 4) = cast('RIFF' as binary) and " +
          s"substring($c, 9, 4) = cast('WAVE' as binary) and " +
          s"substring($c, 37, 4) = cast('data' as binary)"))
      // rate != 0 is a validity check, not just a div-by-zero guard: a
      // zero-rate header is malformed and must surface as bad-fmt rather
      // than kill the scan at `duration_ms` under ANSI mode (the same
      // row-isolation posture as MimeDetect's nullif guard).
      .withColumn("__fmt_ok", expr(
        s"(${le16(c, 21)}) = 1 and (${le16(c, 23)}) = 1 and (${le16(c, 35)}) = 16" +
          s" and (${le32(c, 25)}) != 0"))
      .withColumn("wav_error",
        when(not(col("__riff_ok")), lit("bad-riff"))
          .when(not(col("__fmt_ok")), lit("bad-fmt"))
          // a truncated or padded clip must error, not fold nulls: the
          // data-size field has to match the actual byte count exactly
          .when(expr(s"length($c)") =!= expr(s"${HeaderLen} + (${le32(c, 41)})"),
            lit("bad-length")))
      .withColumn("sample_rate",
        when(col("wav_error").isNull, expr(le32(c, 25))))
      .withColumn("n_samples",
        when(col("wav_error").isNull, expr(s"(${le32(c, 41)}) div 2")))
      .withColumn("duration_ms",
        when(col("wav_error").isNull, expr("n_samples * 1000 div sample_rate")))
      .withColumn("__stats",
        when(col("wav_error").isNull && lit(nativeSampleFold),
          graft.functions.NativeExpressions.wavSampleStats(col(contentCol))))
      // n_samples = 0 must short-circuit: sequence(0, -1) is [0, -1] in
      // Spark (step defaults to -1 when start > stop), which would fold
      // two header bytes as a phantom sample.
      .withColumn("sum_abs",
        if (nativeSampleFold) when(col("wav_error").isNull, col("__stats.sum_abs"))
        else when(col("wav_error").isNull, expr(
          s"case when n_samples > 0 then " +
            s"aggregate(sequence(0, cast(n_samples as int) - 1), 0L, (a, i) -> a + abs($signed)) " +
            s"else 0L end")))
      .withColumn("peak_abs",
        if (nativeSampleFold) when(col("wav_error").isNull, col("__stats.peak_abs"))
        else when(col("wav_error").isNull, expr(
          s"case when n_samples > 0 then " +
            s"aggregate(sequence(0, cast(n_samples as int) - 1), 0L, (a, i) -> greatest(a, abs($signed))) " +
            s"else 0L end")))
      .drop("__riff_ok", "__fmt_ok", "__stats")
  }
}
