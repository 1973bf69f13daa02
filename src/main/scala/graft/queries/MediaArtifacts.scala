package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Decode-once MEDIA FEATURE artifacts — the [[ClusterArtifacts]]
  * discipline applied to the multimodal codec chains.
  *
  * Round 10's plan audit put the whole top of the quiet bench on the
  * media family (q146 9.9 s, q131 8.6 s, q127 8.3 s, q89 6.6 s, q145
  * ~5 s) and adjudicated the cost as "the codec, not the plan" — but the
  * codec was being paid PER QUERY: q109, q110, q128 and q131 each
  * re-decoded every planted PNG (q131 twice — once through imageQc, once
  * through imagePhash), q89 and q127 each re-walked every GRAV container
  * and re-decoded every frame, q74/q119 and q145 each re-parsed every
  * WAV. At 100 TB that is N full decode passes of the corpus where a
  * production pipeline runs exactly ONE decode/feature-extraction pass
  * and every downstream consumer (QC gates, perceptual dedup, curation
  * censuses, scene-cut sampling) reads the persisted feature table —
  * the lakehouse "bronze → silver" step for binary media.
  *
  * Mechanics are [[Tables.buildOnce]]: keyed on the canonical corpus
  * path, idempotent via `_COMPLETE` marker, consumers FileScan the
  * parquet (never the mapPartitions decode subtree — PlanAuditSpec pins
  * the kernel OUT of consumer plans). Feature values are bit-equal to
  * the per-query kernels they replace (the fused
  * [[Multimodal.ImageCodec.allStats]] is spec-pinned against
  * channelSums/aHash64/qcStats), so artifact reuse is hash-invisible to
  * every consumer's oracle. Artifact names carry the fixture + kernel
  * contract and MUST bump on any planting or convention change — a
  * stale same-named artifact would serve silently wrong features. */
object MediaArtifacts {

  /** DOC-KEYED image features (one 8×8 PNG per document, gen = doc_id):
    * channel sums + aHash halves + QC gray stats from ONE decode.
    * Consumers: q73 (sums), q186 (hash bits → ±1 visual feature). */
  def imageDocFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = Tables.buildOnce("graft_media_features", dir, "image_doc_v1") { out =>
      Tables.documents(spark, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.ImageCodec.allStats(Multimodal.ImageCodec.syntheticPng(id)))
        })
        .select(col("_1").as("media_id"), col("_2.*"))
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
  }

  /** PLANTED image features (q109's fixture: every document's image plus
    * a planted duplicate for doc_id % 7 = 0, gen-keyed so dups decode to
    * identical pixels). Consumers: q109 (hash + n_set), q110 (hash),
    * q128 (QC stats), q131 (BOTH — previously two more decode passes). */
  def imagePlantedFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = Tables.buildOnce("graft_media_features", dir, "image_planted_v1") { out =>
      SimilarityQueries.plantedMedia(spark, dir)
        .select(col("media_id"), col("gen_id")).as[(Long, Long)]
        .mapPartitions(_.map { case (mid, gid) =>
          (mid, Multimodal.ImageCodec.allStats(Multimodal.ImageCodec.syntheticPng(gid)))
        })
        .select(col("_1").as("media_id"), col("_2.*"))
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
  }

  /** DOC-KEYED per-FRAME video features (q89's fixture: one GRAV
    * container per document, payload corruption planted at
    * doc_id % 50 = 0): one container walk + one PNG decode per frame →
    * (frame_idx, dims, channel sums, aHash halves), corrupt containers
    * as single error rows. Consumers: q89 (stride-2 sum rows — an exact
    * filter+projection), q127 (hamming lags over the hashes — an exact
    * window fold). */
  def videoDocFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = Tables.buildOnce("graft_media_features", dir, "video_doc_frames_v1") { out =>
      val vids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val bytes = graft.multimodal.VideoCodec.syntheticVideo(id)
          if (id % 50 == 0) {
            // flip a byte INSIDE the payload region: the index stays
            // walkable, the container CRC does not (q89's planting)
            val n = 4 + (id % 4).toInt
            val p = 13 + 8 * n + 10
            bytes(p) = (bytes(p) ^ 0x5A).toByte
          }
          (id, bytes)
        }).toDF("media_id", "content")
      graft.multimodal.VideoCodec.frameFeatures(vids)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
  }

  /** PLANTED per-video curation SIGNATURES (q146's fixture: plantedMedia
    * containers, corruption gen-keyed at gen_id % 50 = 0): frame count,
    * scene cuts, majority-vote frame-hash fingerprint halves, error —
    * [[graft.multimodal.VideoCodec.videoSignature]] materialized once. */
  def videoPlantedSignatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = Tables.buildOnce("graft_media_features", dir, "video_planted_sig_v1") { out =>
      val vids = SimilarityQueries.plantedMedia(spark, dir)
        .select(col("media_id"), col("gen_id")).as[(Long, Long)]
        .mapPartitions(_.map { case (mid, gid) =>
          val bytes = graft.multimodal.VideoCodec.syntheticVideo(gid)
          if (gid % 50 == 0) { // q127's corruption planting, gen-keyed
            val n = 4 + (gid % 4).toInt
            val p = 13 + 8 * n + 10
            bytes(p) = (bytes(p) ^ 0x5A).toByte
          }
          (mid, bytes)
        }).toDF("media_id", "content")
      graft.multimodal.VideoCodec.videoSignature(vids, cutHamming = 20)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
  }

  /** DOC-KEYED audio features (one PCM16 WAV per document): the full
    * parse columns (rate, samples, duration, |s| sum/peak) PLUS the QC
    * kernel (clipping, longest silence, energy) PLUS the delta-sign
    * fingerprint, all from one pass over the bytes. Consumers: q74
    * (parse stats), q119 (QC stats), q220 (flags + fp dup census).
    * v2 = fp column joined the schema. */
  def audioDocFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = Tables.buildOnce("graft_media_features", dir, "audio_doc_v2") { out =>
      val wavs = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, graft.multimodal.AudioWav.syntheticWav(id))))
        .toDF("media_id", "content")
      val qc = graft.functions.NativeExpressions.wavQcStats(col("content"), 1000, 50)
      graft.multimodal.AudioWav.parsed(wavs)
        .withColumn("q", qc)
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          col("duration_ms"), col("sum_abs"), col("peak_abs"),
          col("q.n_samples").as("qc_n_samples"),
          col("q.n_clipped").as("n_clipped"),
          col("q.longest_silence").as("longest_silence"),
          col("q.energy").as("energy"),
          graft.multimodal.AudioWav.deltaFingerprint().as("fp"))
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
  }

  /** PLANTED audio curation features (q145's fixture): QC gates +
    * delta-sign fingerprint from one decode pass. */
  def audioPlantedFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = Tables.buildOnce("graft_media_features", dir, "audio_planted_v1") { out =>
      val wavs = SimilarityQueries.plantedMedia(spark, dir)
        .select(col("media_id"), col("gen_id")).as[(Long, Long)]
        .mapPartitions(_.map { case (mid, gid) =>
          (mid, graft.multimodal.AudioWav.syntheticWav(gid))
        }).toDF("media_id", "content")
      val qc = graft.functions.NativeExpressions.wavQcStats(col("content"), 1000, 50)
      graft.multimodal.AudioWav.parsed(wavs)
        .withColumn("q", qc)
        .select(col("media_id"), col("q.n_clipped").as("n_clipped"),
          col("q.longest_silence").as("longest_silence"),
          graft.multimodal.AudioWav.deltaFingerprint().as("fp"))
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
  }

  /** ROBUSTNESS-EVAL image fixture + features (q222): a PINNED,
    * spec-fixed eval corpus — the 450 base images of doc_id < 450 (the
    * q196 fixed-sample / q203 pinned-eval posture: an eval table must
    * not ride corpus size, and the CC fixpoint it feeds must be
    * constant-cost at any scale; 450 < the smallest SF's 500 docs, and
    * ScaleProbe copies offset ids by 10⁸, so the corpus is byte-identical
    * at every SF and probe multiple) — plus, for doc_id % 9 = 0, three
    * PLANTED variants with closed-form perturbations —
    *   'shift'     (media_id + 3·10⁶): every channel +60, clamped at 255
    *                (global brightness; aHash is threshold-vs-mean, so
    *                most bits survive except where clamping bends the
    *                gray ordering),
    *   'noise'     (media_id + 4·10⁶): the red channel rotated +128 mod
    *                256 at three fixed pixels (local corruption → a few
    *                hash bits flip),
    *   'unrelated' (media_id + 5·10⁶): a different generator seed
    *                (gen + 777777) — the must-NOT-match control.
    * One decode pass to (media_id, family, hash halves), build-once. */
  /** q222's pinned eval-corpus bound (see [[imageRobustFeatures]]). */
  val EvalCorpusBound = 450L

  def imageRobustFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = Tables.buildOnce("graft_media_features", dir, "image_robust_v2") { out =>
      val ids = Tables.documents(spark, dir)
        .filter(col("doc_id") < EvalCorpusBound).select(col("doc_id")).as[Long]
      val noisePx = Set((0, 0), (3, 4), (7, 7))
      ids.mapPartitions(_.flatMap { id =>
        val base = (id, "base",
          Multimodal.ImageCodec.allStats(Multimodal.ImageCodec.syntheticPng(id)))
        if (id % 9 != 0) Iterator(base)
        else Iterator(base,
          (id + 3000000L, "shift", Multimodal.ImageCodec.allStats(
            Multimodal.ImageCodec.syntheticPngWith(id)((_, _, r, g, b) =>
              (math.min(255, r + 60), math.min(255, g + 60), math.min(255, b + 60))))),
          (id + 4000000L, "noise", Multimodal.ImageCodec.allStats(
            Multimodal.ImageCodec.syntheticPngWith(id)((x, y, r, g, b) =>
              if (noisePx((x, y))) ((r + 128) % 256, g, b) else (r, g, b)))),
          (id + 5000000L, "unrelated", Multimodal.ImageCodec.allStats(
            Multimodal.ImageCodec.syntheticPng(id + 777777L))))
      })
        .select(col("_1").as("media_id"), col("_2").as("family"),
          col("_3.hash_hi").as("hash_hi"), col("_3.hash_lo").as("hash_lo"))
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
  }
}
