package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Dedup
import graft.sources.Tables

/** Shared on-disk NEAR-DUP CLUSTER artifacts — the `postingsIndexFor`
  * move (service/GraftService.scala) applied to the two capped-LSH →
  * connected-components chains that eight queries previously each
  * recomputed from scratch:
  *
  *   - TEXT chain (q33/q108/q166/q178/q182/q184/q189/q192/q193/q204): planted-near-dup
  *     corpus → portable SimHash table → hamming ≤ 7 banded pairs,
  *     degree-capped at 4 → connected components. Persists BOTH the
  *     (id, cluster_id) labels and the capped (id_a, id_b, hamming)
  *     pair set — label consumers and pair consumers (threshold
  *     sensitivity, chaining audit) share one build.
  *   - EMBEDDING chain (q80/q98/q136/q138): random-hyperplane LSH pairs
  *     (8 planes × 12 tables, cosine ≥ 0.3, degree cap 4) → connected
  *     components → (id, cluster_id) labels.
  *
  * Each label table is built ONCE per corpus directory (keyed on the
  * FULL canonical path, idempotent via `_COMPLETE` marker, exactly the
  * serving-index discipline) and every consumer reads the parquet — so
  * the consumer plan is a FileScan of the artifact, never the
  * signature/banding/fixpoint subtree. At 100 TB this is the difference
  * between one cluster build per corpus and one per *consumer*: round
  * 9 measured the text substrate alone at 304.6 s at 50× and eight
  * queries each paid it. Both chains are fully deterministic (portable
  * md5-derived hashes, deterministic degree-cap tie-breaks, CC's
  * min-reachable-id fixpoint), so artifact reuse is bit-invisible to
  * every consumer's output — the oracle SQL still replays the whole
  * chain per query and must keep matching.
  *
  * The cache assumes an immutable corpus directory (true of every sf
  * dir here); a mutated corpus needs the artifact dir removed. The
  * CHAIN NAME is the schema/semantics contract: artifacts outlive the
  * process, so any change to a chain's parameters, layout, or hash
  * convention MUST bump its name (as `simhash_h7_d4` → `text_h7_d4_lp`
  * did when the pair subtree landed) — a stale same-named artifact
  * would serve silently wrong labels. The build-once mechanics live in
  * [[Tables.buildOnce]], shared with the serving indexes and shards.
  */
object ClusterArtifacts {

  /** (id, cluster_id) labels of the TEXT near-dup chain over the
    * planted-near-dup corpus — q33's exact substrate. The build also
    * persists the capped PAIR set (id_a, id_b, hamming) it passes
    * through CC — [[simhashPairs]] reads it, so pair-level consumers
    * (q184's threshold sensitivity) are census-cost too. */
  def simhashLabels(spark: SparkSession, dir: String): DataFrame =
    textChain(spark, dir, "labels")

  /** The capped (id_a, id_b, hamming) pair set of the TEXT chain —
    * q13b's exact edges, persisted by the same one-per-corpus build. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    textChain(spark, dir, "pairs")

  // chain names deliberately avoid the substrings "simhash"/"lsh_":
  // the plan-shape spec asserts those are ABSENT from consumer plans
  // (they would only appear if the chain were recomputed), and the
  // artifact path itself must not be a false positive
  private def textChain(spark: SparkSession, dir: String, sub: String): DataFrame = {
    val root = Tables.buildOnce("graft_cluster_artifacts", dir, "text_h7_d4_lp") { out =>
      val corpus = DedupQueries.withPlantedNearDups(Tables.documents(spark, dir))
      val sims = Dedup.simhashTable(corpus, "doc_id", "text",
        hasher = graft.functions.TextFunctions.portableHash60)
      val pairs = Dedup.simhashNearDupPairs(sims, maxHamming = 7, maxDegree = 4)
        .localCheckpoint(true) // pair write + CC both consume
      pairs.write.mode("overwrite").parquet(s"$out/pairs")
      Dedup.connectedComponents(pairs).write.mode("overwrite").parquet(s"$out/labels")
    }
    spark.read.parquet(s"$root/$sub")
  }

  /** (id, cluster_id) labels of the EMBEDDING near-dup chain — q80's
    * exact substrate. */
  def embeddingLabels(spark: SparkSession, dir: String): DataFrame = {
    val path = Tables.buildOnce("graft_cluster_artifacts", dir, "emb_p8_t12_c030_d4") { out =>
      val pairs = graft.ops.Similarity.lshNearDupPairs(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        dim = 64, planes = 8, tables = 12, cosineThreshold = 0.3, maxDegree = 4)
      Dedup.connectedComponents(pairs).write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(path)
  }
}
