package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline
  * (BASELINE.json north-star). The reference's only dedup primitive is a
  * SHA-1 content digest (reference: participants/implementations.kt:41-52);
  * exact dedup generalizes that, and MinHash/SimHash/Jaccard add the
  * near-duplicate family a 100 TB corpus needs.
  *
  * Scale design, common to all ops here:
  *   - candidate generation is always *bucketed* (LSH bands / simhash
  *     chunks / blocking keys) so the self-join is an equi-join on the
  *     bucket key — never an O(n²) cross join;
  *   - per-doc work (shingling, signatures) is narrow higher-order-array
  *     computation — no shuffle, no UDF, no driver involvement;
  *   - hot buckets (degenerate content) are capped before pairing so one
  *     pathological key cannot produce a quadratic blowup.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups by content digest: one shuffle on the hash.
    * Returns (digest, n_docs, keep_id = min id). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("digest", md5(col(textCol).cast("binary")))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  // ------------------------------------------------------------- shingles

  /** Distinct word n-gram shingles; documents shorter than n collapse to a
    * single whole-text shingle (so every doc has ≥1). */
  def wordShingles(text: Column, n: Int): Column = {
    val w = split(text, " ")
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n))))))
      .otherwise(array(text))
  }

  // -------------------------------------------------------- MinHash + LSH

  /** K-permutation MinHash signature over shingles. Each "permutation" is
    * xxhash64 seeded by the permutation index; min over shingles. Narrow,
    * per-row, no shuffle. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      p => array_min(transform(shingles, s => xxhash64(s, p))))

  /** LSH banding: split the signature into `bands` bands of `rows` values,
    * hash each band. Output one (band, bandHash) struct per band. */
  def lshBands(signature: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(slice(signature, b * rows + 1, lit(rows))).as("band_hash")))

  /** Near-duplicate pairs via MinHash LSH, verified with exact Jaccard on
    * the shingle sets.
    *
    * Pipeline: shingle → signature → explode bands → bucket self-join on
    * (band, band_hash) with id< id (dedup across bands via distinct pair)
    * → join signatures back → exact Jaccard filter.
    *
    * `maxBucket` drops degenerate buckets (e.g. boilerplate shared by
    * thousands of docs) — at 100 TB such buckets otherwise dominate the
    * pair count quadratically; callers get them reported separately if
    * needed by inspecting bucket sizes themselves.
    */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
      jaccardThreshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val rows = k / bands
    require(bands * rows == k, "k must be divisible by bands")

    // Materialize the shingle table BEFORE deriving signatures: without a
    // barrier, CollapseProject inlines the (non-codegen, higher-order)
    // shingle expression into all k permutations × all bands, exploding
    // interpreted eval cost combinatorially. At 100 TB the signature
    // table is likewise persisted once and reused, never recomputed
    // per consumer.
    val shingled = docs.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleN).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withBands = shingled
      .withColumn("sig", minhashSignature(col("shingles"), k))
      .withColumn("banded", lshBands(col("sig"), bands, rows))
      .select(col("id"), col("shingles"), explode(col("banded")).as("b"))
      .select(col("id"), col("shingles"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))

    // Cap pathological buckets before pairing (quadratic-blowup guard).
    val bucketed = withBands
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("band_hash"))))
      .filter(col("bucket_n") <= maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val l = bucketed.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("shingles").as("sh_a"))
    val r = bucketed.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("shingles").as("sh_b"))
    val pairs = l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    pairs
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact Jaccard over two distinct-element arrays: |A∩B| / |A∪B| as a
    * ratio of exact ints. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  // --------------------------------------------------------------- SimHash

  /** SimHash computed via explode + partial aggregation — scales to
    * arbitrarily many shingles per doc and keeps the per-bit vote exact.
    * Two keyed shuffles on `id`; both benefit from map-side combine.
    * Returns (id, simhash).
    *
    * Bit 63 uses `shiftleft(1, 63)` = Long.MinValue; summing distinct
    * powers of two reconstructs the signed two's-complement value without
    * overflow. */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), shingleN)).as("shingle"))
      .withColumn("h", xxhash64(col("shingle")))
    // one row per (doc, bit): vote = +1 if bit set else -1
    val bits = sh.select(col("id"), col("h"),
      explode(sequence(lit(0), lit(63))).as("bit"))
      .withColumn("vote",
        when(expr("(shiftrightunsigned(h, bit) & 1L) = 1L"), lit(1L))
          .otherwise(lit(-1L)))
    bits.groupBy(col("id"), col("bit"))
      .agg(sum(col("vote")).as("votes"))
      .groupBy(col("id"))
      .agg(sum(when(col("votes") > 0,
        expr("shiftleft(cast(1 as bigint), bit)")).otherwise(lit(0L))).as("simhash"))
  }

  /** Hamming-distance near-dup candidates from simhash values: band the
    * 64 bits into 4×16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical
    * chunk), bucket-join, verify with bit_count(xor). */
  def simhashNearDupPairs(sims: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunked = sims.select(col("id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("chunk_val",
        expr("shiftrightunsigned(simhash, chunk * 16) & 65535"))
    val l = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_a"), col("simhash").as("sim_a"))
    val r = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_b"), col("simhash").as("sim_b"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Pairwise n-gram Jaccard within a blocking key (equi-join on the
    * block, never a global cross join). At scale the block key is an LSH
    * bucket; for moderate partitions any low-cardinality attribute works. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, shingleN: Int = 2, threshold: Double = 0.0): DataFrame = {
    val base = docs.select(col(blockCol).as("block"), col(idCol).as("id"),
      wordShingles(col(textCol), shingleN).as("sh"))
    val l = base.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = base.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("block"), col("id_a"), col("id_b"), col("jaccard"))
  }
}
