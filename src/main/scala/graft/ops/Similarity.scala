package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`) —
  * BASELINE.json north-star.
  *
  * Three tiers:
  *   1. `cosine` / `bruteForceTopK` — exact, scan-everything baseline.
  *      At 100 TB this is a single narrow map + TakeOrdered (per-partition
  *      top-k, tiny reduce) per query vector; fine for few queries.
  *   2. `quantizedCosine` — the same computation on floor(x*1000) BIGINTs:
  *      exact integer dot/norms, so results are engine-reproducible (used
  *      by the DuckDB-checked query surface).
  *   3. `hyperplaneLsh*` — random-hyperplane signatures: candidate
  *      generation becomes an equi-join on the signature bucket, the
  *      scale path for all-pairs / many-query workloads.
  */
object Similarity {

  /** Cosine similarity of two equal-length float-array columns, computed
    * in double. Single pass: one aggregate over the zipped array. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => (x * y).cast("double")), lit(0.0), _ + _)
    val na = aggregate(transform(a, x => (x * x).cast("double")), lit(0.0), _ + _)
    val nb = aggregate(transform(b, x => (x * x).cast("double")), lit(0.0), _ + _)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** floor(x*1000) quantization — engine-independent exact ints. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000).cast("long"))

  /** Cosine from quantized vectors: integer dot and norms (exact,
    * order-free), one double division at the end — bit-identical across
    * engines. */
  def quantizedCosine(qa: Column, qb: Column): Column = {
    val dot = aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), _ + _).cast("double")
    val na = aggregate(transform(qa, x => x * x), lit(0L), _ + _).cast("double")
    val nb = aggregate(transform(qb, x => x * x), lit(0L), _ + _).cast("double")
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Exact top-k neighbours of one query vector (given as a 1-row frame
    * with column `q`). Broadcast of the single-row side + TakeOrdered —
    * no shuffle of the corpus. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int): DataFrame =
    corpus.crossJoin(broadcast(query))
      .withColumn("cosine", cosine(col(vecCol), col("q")))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)

  /** All-pairs near-neighbour candidates via multi-table hyperplane LSH:
    * `tables` independent sign signatures of `planes` hyperplanes each; a
    * pair is a candidate if it collides in ANY table (recall
    * 1-(1-s^planes)^tables for angular similarity s), then verified with
    * exact cosine. Bucket key is (table, signature) — always an equi-join;
    * `maxBucket` caps degenerate buckets (the near-zero-vector bucket at
    * 100 TB would otherwise pair quadratically). */
  def lshNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int = 6, tables: Int = 16,
      cosineThreshold: Double = 0.9, maxBucket: Int = 5000): DataFrame = {
    val signed = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("t", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("sig", packedSignatureFor(col("v"), col("t"), dim, planes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = signed.withColumn("bucket_n", count(lit(1))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(col("t"), col("sig"))))
      .filter(col("bucket_n") <= maxBucket)
    val l = capped.select(col("t"), col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val r = capped.select(col("t"), col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("t", "sig"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= cosineThreshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Sign signature packed as sum of 2^p over planes with positive dot.
    * Hyperplane components in [-1, 1], derived deterministically from
    * xxhash64((table*planes + p)*dim + i) — no stored model. */
  def packedSignature(vec: Column, dim: Int, planes: Int): Column =
    packedSignatureFor(vec, lit(0), dim, planes)

  def packedSignatureFor(vec: Column, table: Column, dim: Int, planes: Int): Column = {
    require(planes <= 62)
    val terms = transform(sequence(lit(0), lit(planes - 1)), p => {
      val planeBase = (table * planes + p) * dim
      val dot = aggregate(
        zip_with(vec, sequence(planeBase, planeBase + (dim - 1)),
          (x, seed) => x.cast("double") *
            ((pmod(xxhash64(seed), lit(2001L)) - 1000L).cast("double") / lit(1000.0))),
        lit(0.0), _ + _)
      when(dot > 0, pow2(p)).otherwise(lit(0L))
    })
    aggregate(terms, lit(0L), _ + _)
  }

  /** 2^p as a Long for p ≤ 62. Powers of two are exact in IEEE double,
    * so pow→cast is lossless in this range. */
  private def pow2(p: Column): Column = pow(lit(2.0), p).cast("long")
}
