package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TrainingPrep}
import graft.sources.Tables

/** Shared on-disk CURATION-CHAIN artifacts — the [[ClusterArtifacts]]
  * discipline applied to the two stage families the Dolma-shape chain
  * queries each re-derived from raw text (round 11's top bench cost
  * cluster: q100 4.2 s, q38 3.4 s, q160 3.2 s quiet, q100 4.6× at 50×):
  *
  *   - the PARAGRAPH first-occurrence grid (CCNet paragraph dedup over
  *     the 7-word split of the corpus) shared by q87 / q100 / q125 /
  *     q160 — ONE fingerprint-keyed window per corpus instead of one
  *     per consumer, persisted as BOTH the per-doc grid (n_paras,
  *     n_kept, clean_text) and the per-paragraph firsts table (q125's
  *     source-attribution feed), derived from a single ranked frame;
  *   - the reference-slice BIGRAM LM tables: per-doc surprisal +
  *     tercile buckets over the RAW corpus (q93 / q170 / q195 share
  *     one build) and over the CLEANED corpus (q100 / q160 share one
  *     build) — previously five separate count-table constructions of
  *     the same two models per verify run.
  *
  * At 100 TB this is one paragraph shuffle and two LM count-table
  * builds per corpus instead of one per *query*. Everything here is
  * fully deterministic (md5 exact-dup winners, fingerprint-pair
  * first-occurrence, integer floor-log₂ surprisal), so artifact reuse
  * is bit-invisible to every consumer — the oracle SQL still replays
  * the whole chain per query and must keep matching.
  *
  * Restriction lemma (why q100/q160 may read the grid built over ALL
  * documents): an exact-duplicate document D never contributes a first
  * occurrence — its canonical twin C has identical paragraphs at
  * identical ordinals and a smaller doc_id, so (C, idx) precedes
  * (D, idx) in the window's total order for every paragraph. Hence the
  * grid over the full corpus, restricted to the exact-dup winners,
  * equals the grid computed over the winners alone — for ANY corpus,
  * not just this one. The same argument covers q160's planted replica
  * shard (replicas at doc_id + 10⁶ never win and never lead).
  *
  * Chain names are the semantics contract (see [[ClusterArtifacts]]):
  * any change to the split width, fingerprint convention, LM reference
  * slice, or layout MUST bump the name. */
object CurationArtifacts {

  /** Per-doc paragraph-dedup grid over ALL documents:
    * (doc_id, n_paras, n_kept, clean_text) — q87's exact output
    * substrate, and via the restriction lemma the cleaned-corpus feed
    * of q100/q160. */
  def paragraphGrid(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${gridRoot(spark, dir)}/grid")

  /** Per-distinct-paragraph first-occurrence table:
    * (pk = md5(para), fdoc, fidx, source_first) — q125's attribution
    * feed. Grouping is by the window's 128-bit fingerprint pair; the
    * md5 key is carried for the consumer join (identical modulo ~2⁻¹²⁸
    * simultaneous collisions — the q12 precedent). */
  def paragraphFirsts(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${gridRoot(spark, dir)}/firsts")

  /** Exact-dup winners of the document corpus: (doc_id, source) where
    * doc_id is the min id of its byte-identical text group. On this
    * corpus (no byte-identical texts) it is the identity set; the
    * artifact records the STAGE, so a corpus with real dups still
    * curates correctly. */
  def uniqWinners(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${gridRoot(spark, dir)}/uniq")

  private def gridRoot(spark: SparkSession, dir: String): String =
    Tables.buildOnce("graft_cluster_artifacts", dir, "para_grid7_v1") { out =>
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
      import org.apache.spark.sql.expressions.Window
      docs
        .withColumn("__rn", row_number().over(
          Window.partitionBy(md5(col("text").cast("binary")))
            .orderBy(col("doc_id").asc)))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("source"))
        .write.mode("overwrite").parquet(s"$out/uniq")
      val paras = docs
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"), col("source"), posexplode(expr(
          "transform(sequence(0, cast(ceil(size(ws)/7.0) as int) - 1)," +
            " i -> concat_ws(' ', slice(ws, i*7 + 1, 7)))")).as(Seq("idx", "para")))
      val ranked = Dedup.paragraphFirstRanked(paras)
        .localCheckpoint(true) // one window, two derived writes
      ranked.filter(col("is_first"))
        .select(md5(col("para").cast("binary")).as("pk"),
          col("doc_id").as("fdoc"), col("idx").as("fidx"),
          col("source").as("source_first"))
        .write.mode("overwrite").parquet(s"$out/firsts")
      Dedup.paragraphReassemble(ranked.drop("source"))
        .write.mode("overwrite").parquet(s"$out/grid")
    }

  /** Bigram-LM surprisal + tercile buckets over the RAW corpus, ref
    * slice doc_id % 3 = 0: (doc_id, n_bigrams, bits_total, n_unseen,
    * avg_micro, bucket) — q93's exact output, q170's gate feed, and
    * (n_bigrams, bits_total) q195's loss feed. */
  def lmRawBuckets(spark: SparkSession, dir: String): DataFrame = {
    val path = Tables.buildOnce("graft_cluster_artifacts", dir, "lm_raw_buckets_v1") { out =>
      val docs = Tables.documents(spark, dir)
      TrainingPrep.lmQualityBuckets(
          docs, docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
  }

  /** The FROZEN reference-LM MODEL — count tables + tercile thresholds,
    * not per-doc scores: `uni` (w1, c1) and `bg` (bg, c12) over the
    * trusted slice (doc_id % 3 = 0), plus the 1-row `thr` (t1, t2)
    * tercile thresholds of the whole corpus's per-doc surprisal
    * (identical arithmetic to [[graft.ops.TrainingPrep.lmQualityBuckets]]).
    * This is what a STREAMING quality gate consumes
    * ([[graft.streaming.Streaming.incrementalCurationLogSink]]): a gate
    * scores arrivals against a frozen, versioned model — it does not
    * retrain per micro-batch. Bounded by the reference vocabulary, so
    * the serving read broadcasts. */
  def lmRefModelDir(spark: SparkSession, dir: String): String = {
    val perDoc = lmRawBuckets(spark, dir) // hoisted: no nested buildOnce
    Tables.buildOnce("graft_cluster_artifacts", dir, "lm_ref_model_v1") { out =>
      val ref = Tables.documents(spark, dir).filter(col("doc_id") % 3 === 0)
      ref.select(explode(split(col("text"), " ")).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        .write.mode("overwrite").parquet(s"$out/uni")
      ref.withColumn("__ws", split(col("text"), " "))
        .filter(size(col("__ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(__ws) - 2)," +
            " i -> concat(element_at(__ws, i + 1), ' ', element_at(__ws, i + 2)))"))
          .as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
        .write.mode("overwrite").parquet(s"$out/bg")
      val hist = graft.ops.OrderStats
        .cumHistogram(perDoc.select(col("avg_micro")), "avg_micro")
        .localCheckpoint(true)
      hist.crossJoin(broadcast(hist.agg(sum(col("nv")).as("n"))))
        .agg(
          min(when(col("cum") * 3 >= col("n"), col("avg_micro"))).as("t1"),
          min(when(col("cum") * 3 >= col("n") * 2, col("avg_micro"))).as("t2"))
        .write.mode("overwrite").parquet(s"$out/thr")
    }
  }

  /** The q223 SELECTION MANIFEST as a build-once artifact — the
    * RHO-style excess-loss top-50 (doc_id, n_bigrams, ref_micro,
    * self_micro, rho_micro) a training run consumes. Like the curation
    * decision log, selection is a training-ops artifact with a serving
    * surface ([[graft.service.GraftService]] `GET /selection`): the
    * facade reads the frozen manifest, it never re-scores the corpus
    * per request. Content is exactly [[graft.queries.TextQueries
    * .rhoSelection]] (the oracle-gated q223), re-ranked on read because
    * parquet does not persist order. */
  def rhoManifest(spark: SparkSession, dir: String): DataFrame = {
    val path = Tables.buildOnce("graft_cluster_artifacts", dir, "rho_manifest_v1") { out =>
      graft.queries.TextQueries.rhoSelection(spark, dir)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
      .orderBy(col("rho_micro").desc, col("doc_id").asc)
      .limit(50) // the manifest contract: TakeOrdered, bounded even if the file grew
  }

  /** Bigram-LM buckets over the CLEANED corpus (exact-dup winners →
    * paragraph-dedup reassembly), ref slice doc_id % 3 = 0 — the
    * quality gate q100 and q160 share. Built FROM the grid artifact
    * (restricted to winners per the lemma), so the paragraph window
    * never re-runs. */
  def lmCleanBuckets(spark: SparkSession, dir: String): DataFrame = {
    // hoisted OUTSIDE buildOnce: a nested computeIfAbsent on the same
    // map risks a stripe deadlock, and the grid must exist first anyway
    val grid = paragraphGrid(spark, dir)
    val uniq = uniqWinners(spark, dir)
    val path = Tables.buildOnce("graft_cluster_artifacts", dir, "lm_clean_buckets_v1") { out =>
      val cleaned = grid.join(uniq.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("clean_text").as("text"))
      TrainingPrep.lmQualityBuckets(
          cleaned, cleaned.filter(col("doc_id") % 3 === 0), "doc_id", "text")
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
  }
}
