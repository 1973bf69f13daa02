package graft

import org.apache.spark.sql.functions._

import graft.queries.ClusterArtifacts

/** The shared near-dup cluster artifacts: built once per corpus dir,
  * bit-identical to the from-scratch chain, and consumers plan as a
  * FileScan of the artifact — never the LSH→CC subtree. */
class ClusterArtifactsSpec extends SparkSpec {

  private def freshCorpus(): String = {
    // a private copy of the sf0.001 tables so this suite controls the
    // artifact lifecycle (the /tmp cache is keyed on the canonical dir)
    val root = java.nio.file.Files.createTempDirectory("graft_clart").toString
    for (t <- Seq("documents", "embeddings")) {
      spark.read.parquet(s"${sf()}/$t.parquet")
        .write.parquet(s"$root/$t.parquet")
    }
    root
  }

  test("simhash labels match the from-scratch chain and build exactly once") {
    val dir = freshCorpus()
    val fromArtifact = ClusterArtifacts.simhashLabels(spark, dir)
      .orderBy("id").collect().toSeq
    // from-scratch reference: the exact q33 substrate (planted near-dups
    // replicated inline — withPlantedNearDups is package-private)
    val docs = graft.sources.Tables.documents(spark, dir)
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          expr("concat_ws(' ', slice(split(text, ' '), 2, size(split(text, ' ')) - 1))").as("text")))
    val sims = graft.ops.Dedup.simhashTable(corpus, "doc_id", "text",
      hasher = graft.functions.TextFunctions.portableHash60)
    val pairs = graft.ops.Dedup.simhashNearDupPairs(sims, maxHamming = 7, maxDegree = 4)
    val fresh = graft.ops.Dedup.connectedComponents(pairs)
      .orderBy("id").collect().toSeq
    assert(fromArtifact == fresh,
      s"artifact labels diverge from the from-scratch chain: " +
        s"${fromArtifact.take(3)} vs ${fresh.take(3)}")
    // idempotent: the marker exists and a second call must not rebuild
    // (mtime of the marker is the witness)
    val marker = java.nio.file.Paths.get(graft.sources.Tables.artifactDir(
      "graft_cluster_artifacts", dir, "text_h7_d4_lp") + "/_COMPLETE")
    assert(java.nio.file.Files.exists(marker))
    val t0 = java.nio.file.Files.getLastModifiedTime(marker)
    ClusterArtifacts.simhashLabels(spark, dir).count()
    assert(java.nio.file.Files.getLastModifiedTime(marker) == t0,
      "second call rebuilt the artifact")
  }

  test("consumers plan as a FileScan of the artifact, not the LSH-to-CC subtree") {
    val dir = freshCorpus()
    ClusterArtifacts.embeddingLabels(spark, dir).count() // ensure built
    for ((name, df) <- Seq(
        "q33" -> graft.queries.DedupQueries.dupClusters(spark, dir),
        "q166" -> graft.queries.DedupQueries.softDedupWeights(spark, dir),
        "q182" -> graft.queries.DedupQueries.splitLeakage(spark, dir),
        "q184" -> graft.queries.DedupQueries.dedupSensitivity(spark, dir),
        "q189" -> graft.queries.DedupQueries.clusterAudit(spark, dir),
        "q80" -> graft.queries.SimilarityQueries.embeddingClusters(spark, dir),
        "q138" -> graft.queries.SimilarityQueries.clusterTopics(spark, dir))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_cluster_artifacts"),
        s"$name does not read the shared cluster artifact:\n$plan")
      // the signature/banding subtree must be GONE from the lineage: the
      // artifact read replaces the simhash/hyperplane computation
      assert(!plan.toLowerCase.contains("simhash") && !plan.contains("lsh_"),
        s"$name still recomputes the cluster chain:\n$plan")
    }
  }

  test("persisted pair set matches the from-scratch capped pairs") {
    val dir = freshCorpus()
    val fromArtifact = ClusterArtifacts.simhashPairs(spark, dir)
      .orderBy("id_a", "id_b").collect().toSeq
    val docs = graft.sources.Tables.documents(spark, dir)
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          expr("concat_ws(' ', slice(split(text, ' '), 2, size(split(text, ' ')) - 1))").as("text")))
    val sims = graft.ops.Dedup.simhashTable(corpus, "doc_id", "text",
      hasher = graft.functions.TextFunctions.portableHash60)
    val fresh = graft.ops.Dedup.simhashNearDupPairs(sims, maxHamming = 7, maxDegree = 4)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(fromArtifact == fresh)
  }

  test("embedding labels match the from-scratch chain") {
    val dir = freshCorpus()
    val fromArtifact = ClusterArtifacts.embeddingLabels(spark, dir)
      .orderBy("id").collect().toSeq
    val pairs = graft.ops.Similarity.lshNearDupPairs(
      graft.sources.Tables.embeddings(spark, dir), "vec_id", "embedding",
      dim = 64, planes = 8, tables = 12, cosineThreshold = 0.3, maxDegree = 4)
    val fresh = graft.ops.Dedup.connectedComponents(pairs)
      .orderBy("id").collect().toSeq
    assert(fromArtifact == fresh)
  }

  private def split7(docs: org.apache.spark.sql.DataFrame) = docs
    .withColumn("ws", split(col("text"), " "))
    .select(col("doc_id"), posexplode(expr(
      "transform(sequence(0, cast(ceil(size(ws)/7.0) as int) - 1)," +
        " i -> concat_ws(' ', slice(ws, i*7 + 1, 7)))")).as(Seq("idx", "para")))

  test("curation artifacts: grid and LM buckets match the from-scratch stages bit-for-bit") {
    val dir = freshCorpus()
    val docs = graft.sources.Tables.documents(spark, dir)
    val grid = graft.queries.CurationArtifacts.paragraphGrid(spark, dir)
      .orderBy("doc_id").collect().toSeq
    val freshGrid = graft.ops.Dedup.paragraphDedup(split7(docs))
      .orderBy("doc_id").collect().toSeq
    assert(grid == freshGrid, "grid artifact diverges from paragraphDedup")
    val lm = graft.queries.CurationArtifacts.lmRawBuckets(spark, dir)
      .orderBy("doc_id").collect().toSeq
    val freshLm = graft.ops.TrainingPrep.lmQualityBuckets(
        docs, docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(lm == freshLm, "LM bucket artifact diverges from lmQualityBuckets")
  }

  test("restriction lemma holds on a corpus WITH byte-identical duplicates") {
    // The lemma consumers rely on (CurationArtifacts scaladoc): the grid
    // over ALL documents, restricted to the exact-dup winners, equals the
    // grid computed over the winners alone — test it on a corpus that
    // actually HAS exact dups (the sf corpora don't): every doc_id % 7
    // re-registered byte-identical at doc_id + 5·10⁵.
    val root = java.nio.file.Files.createTempDirectory("graft_lemma").toString
    val base = spark.read.parquet(s"${sf()}/documents.parquet")
    base.unionByName(base.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 500000L))
      .write.parquet(s"$root/documents.parquet")
    val docs = graft.sources.Tables.documents(spark, root)
    val winners = graft.queries.CurationArtifacts.uniqWinners(spark, root)
      .select(col("doc_id"))
    // winners = the originals only
    assert(winners.filter(col("doc_id") >= 500000L).count() == 0)
    val restricted = graft.queries.CurationArtifacts.paragraphGrid(spark, root)
      .join(winners, Seq("doc_id"), "left_semi")
      .orderBy("doc_id").collect().toSeq
    val direct = graft.ops.Dedup.paragraphDedup(split7(
        docs.join(winners, Seq("doc_id"), "left_semi")))
      .orderBy("doc_id").collect().toSeq
    assert(restricted == direct,
      "grid-over-all restricted to winners must equal grid-over-winners")
  }
}
