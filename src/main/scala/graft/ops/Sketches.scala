package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable cardinality sketches — the 100 TB distinct-counting primitive.
  *
  * Spark's built-in `approx_count_distinct` (HLL++) is the production
  * default, but its register layout is engine-private, so its estimates
  * cannot be replayed by an independent engine and the correctness gate
  * could only row-count it. This HyperLogLog is built from fully portable
  * pieces instead — an md5-derived 60-bit hash, integer bucket/rank
  * extraction via binary-string length, and an integer-scaled harmonic sum
  * — so Spark and DuckDB compute BIT-IDENTICAL registers, harmonic sums
  * and (up to one shared double division) estimates. The sketch is also
  * mergeable the way a 1000-executor aggregation needs: registers combine
  * by per-bucket MAX, which Spark executes as a map-side partial
  * aggregation; the shuffle carries at most `M` rows per group regardless
  * of input size.
  *
  * Layout: p = 8 → m = 256 buckets (top 8 bits of the hash); rank =
  * leading-zero count of the remaining 52 bits + 1 ∈ [1, 53]. The raw HLL
  * estimator (no small-range linear-counting branch: `ln` is not
  * bit-portable across engines) is accurate for n ≳ 2.5·m ≈ 640 distinct
  * values with standard error 1.04/√m ≈ 6.5%; callers below that regime
  * should use an exact count — at that size it is cheap anyway.
  */
object Sketches {

  /** m = 2^8 buckets. */
  val HllP = 8
  val HllM = 256
  private val SubBits = 52
  private val SubMask = (1L << SubBits) - 1

  /** alpha_m · m² · 2^53 with the exact literal-folding order mirrored in
    * the SQL oracles (each IEEE op is exactly determined, so embedding
    * `toString` of this constant reproduces it bit-for-bit). The scale is
    * 2^53 — not 2^61 — because rank ≤ 53 makes every term 2^(53−reg) an
    * exact integer while the worst-case sum 256·2^53 = 2^61 still fits
    * int64 (2^61-scaling would overflow at 256·2^61 = 2^69). */
  val HllAlphaScaledE53: Double =
    ((0.7213 / (1.0 + (1.079 / 256.0))) * 65536.0) * 9007199254740992.0

  /** Per-(group, bucket) HLL registers for `valueCol` (any type; hashed
    * through its canonical string form so DuckDB's `md5(CAST(x AS
    * VARCHAR))` sees the same bytes). One row per OBSERVED bucket; absent
    * buckets are register 0 and are accounted for in [[hllEstimate]].
    * Rank via `53 - length(bin(v))`: `bin` renders the minimal binary
    * string in both engines, making leading-zero count an exact string op
    * (floating `log2` would risk off-by-one at powers of two). */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: Column): DataFrame = {
    val h = graft.functions.TextFunctions.portableHash60(valueCol.cast("string"))
    val v = h.bitwiseAND(lit(SubMask))
    df.select(
        groupCols.map(col) :+ shiftright(h, SubBits).as("bucket") :+
          when(v === 0, lit(SubBits + 1))
            .otherwise(lit(SubBits + 1) - length(bin(v))).cast("int").as("rank"): _*)
      .groupBy("bucket", groupCols: _*)
      .agg(max(col("rank")).as("reg"))
  }

  /** Collapse registers to the raw-HLL estimate per group. The harmonic
    * denominator Σ 2^(−reg) is kept as the exact integer Σ 2^(53−reg)
    * (absent buckets contribute 2^53): every term is a dyadic integer and
    * the worst-case sum 256·2^53 = 2^61 fits int64, so `harmonic_e53` is
    * engine-exact and the only floating step is one shared division. Emits
    * (group…, hll_est, harmonic_e53, n_buckets). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - reg)")).as("s_present"),
        count(lit(1)).as("n_buckets"))
      .withColumn("harmonic_e53",
        col("s_present") + (lit(HllM.toLong) - col("n_buckets")) * lit(1L << 53))
      .withColumn("hll_est",
        round(lit(HllAlphaScaledE53) / col("harmonic_e53").cast("double"), 1))
      .drop("s_present")

  /** One-call convenience: portable approx-distinct of `valueCol` per
    * group. Two tiny shuffles (≤ m rows per group each after map-side
    * partials) regardless of input size. */
  def hllApproxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: Column): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol), groupCols)

  // --------------------------------------------------- Count-Min sketch

  /** Count-Min layout: depth 4 independent hash rows × width 1024
    * buckets = 4096 counters, whatever the input size. Error bound:
    * overestimate ≤ 2e/w · N with probability 1 − e^−d. */
  val CmDepth = 4
  val CmWidth = 1024

  /** Row-i bucket of a value — md5-derived with the row index salted into
    * the hashed string, so the d rows are independent AND any engine
    * recomputes them identically.
    *
    * MEASURED negative result (round 4): deriving all d buckets from ONE
    * digest via Kirsch-Mitzenmacher double hashing benchmarked ~65%
    * SLOWER here (3.2 s → 5.3 s solo at sf0.1), not faster — the
    * explode's Generate-side projection does not subexpression-eliminate,
    * so the shared digest is recomputed per element anyway and the extra
    * conv()s outweigh the saved md5 salting. Keep the per-row salted
    * form. */
  def cmBucket(row: Int, valueCol: Column): Column =
    pmod(graft.functions.TextFunctions.portableHash60(
      concat(lit(row.toString), lit(":"), valueCol.cast("string"))), lit(CmWidth.toLong))

  /** Build the sketch: one narrow 1→d explode, one groupBy over at most
    * d·w cells — the shuffle carries ≤ 4096 rows after map-side partial
    * counts regardless of input size. Sketches merge by cellwise SUM
    * (associative + commutative), which is what makes this the 100 TB
    * frequency primitive: per-partition sketches combine on 1000
    * executors with a fixed-size exchange. Returns (row, bucket, cnt). */
  def cmSketch(df: DataFrame, valueCol: Column): DataFrame =
    // spread before the d salted digests per row: the input is typically a
    // narrow projection of a compact parquet file (one or two scan splits),
    // which would serialize the md5-dense expand onto as many tasks
    // (measured: q48's sketch stage was 2.2 s of task time on 3 tasks at
    // sf0.1 — the whole query's wall). Conditional exactly like the
    // shingle pipelines: corpus-scale inputs already arrive wide and pass
    // through exchange-free; the round-robin shuffle this adds for narrow
    // inputs carries only the projected value column.
    Dedup.spread(df.select(valueCol.as("__v")))
      .select(explode(array((0 until CmDepth).map(i =>
        struct(lit(i).as("row"), cmBucket(i, col("__v")).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate the frequency of each probe value: min over the d
    * rows' cells (classic CM — always ≥ the true count). The sketch side
    * is ≤ d·w rows → broadcast; probes are never shuffled. Input `probes`
    * must carry the probed value in column `v`; emits (v, cm_est). */
  def cmEstimate(sketch: DataFrame, probes: DataFrame): DataFrame =
    probes
      .select(col("v"), explode(array((0 until CmDepth).map(i =>
        struct(lit(i).as("row"), cmBucket(i, col("v")).as("bucket"))): _*)).as("c"))
      .select(col("v"), col("c.row").as("row"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col("v"))
      .agg(min(col("cnt")).as("cm_est"))

  // ------------------------------------------- log2-histogram quantiles

  /** log₂ bucket index of a non-negative value: the bit length of
    * ⌊value⌋ minus one (bucket b covers [2^b, 2^(b+1)); values < 1 land
    * in bucket 0). `length(bin(x)) - 1`, NOT an FP log2 — bit counting is
    * integer-exact, so every engine buckets identically (an FP log could
    * round differently exactly AT powers of two, the bucket boundaries). */
  def logBucket(v: Column): Column =
    (length(bin(floor(greatest(v, lit(0))).cast("bigint"))) - 1).as("bucket")

  /** Mergeable log₂-histogram: counts per (keys, bucket). This is the
    * 100 TB quantile primitive the exact path (q28's interpolated
    * percentiles — a per-group SORT of all values) can't be: the shuffle
    * carries ≤ 64 counter rows per key after map-side combine whatever
    * the input size, histograms merge by bucketwise SUM (associative +
    * commutative — per-partition/per-day sketches combine losslessly),
    * and quantiles come off the reduced table. Resolution is the
    * half-power-of-two (relative error ≤ 2×), the classic latency-
    * distribution tradeoff; finer needs sub-bucket interpolation, finer
    * still needs q28. */
  def logHistogram(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.groupBy(keys.map(col) :+ logBucket(value): _*)
      .agg(count(lit(1)).as("n"))

  /** Quantile upper bounds from a log histogram: for each percentile p,
    * the smallest bucket where the cumulative count reaches p% of the
    * total, reported as the bucket's inclusive upper value bound
    * 2^(b+1)−1. All-integer threshold math (100·cum ≥ p·total — no FP
    * rounding at group boundaries). The window runs over the REDUCED
    * histogram (≤ 64 rows per key), not the data. */
  def histogramQuantiles(hist: DataFrame, keys: Seq[String],
      pcts: Seq[Int]): DataFrame = {
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val cum = hist
      .withColumn("cum", sum(col("n")).over(byKey.orderBy(col("bucket"))))
      .withColumn("total", sum(col("n")).over(byKey))
    val qs = pcts.map(p =>
      min(when(col("cum") * 100 >= col("total") * p,
        expr("shiftleft(1L, cast(bucket + 1 as int)) - 1"))).as(s"p${p}_ub"))
    cum.groupBy(keys.map(col): _*)
      .agg(max(col("total")).as("total"), qs: _*)
  }

  /** KMV / theta-style distinct sketch (Bar-Yossef et al. 2002; the
    * k-minimum-values estimator behind theta sketches): per set, the k
    * SMALLEST portable-60-bit hashes of its distinct values. Unlike HLL
    * (q25) a KMV sketch supports SET OPERATIONS — union by merging
    * k-mins, intersection via the Jaccard of the merged sketch — which
    * is what cross-source audience overlap needs.
    *
    * Everything is integer-exact: hashes are the portable md5-prefix
    * 60-bit family (oracle-replayable), the estimator is fixed-point
    * integer division, and a set with < k distinct values keeps ALL its
    * hashes (the sketch degenerates to the exact set — estimates below
    * are then exact by construction).
    *
    * Scale shape: one distinct on (set, hash) then a rank-k window that
    * WindowGroupLimit prunes map-side — each partition forwards at most
    * k rows per set, so the exchange carries O(sets·k), never the data.
    * Sketches are tiny arrays (k·8 B); pairwise ops are row-local. */
  def kmvSketch(df: DataFrame, setCol: String, value: Column,
      k: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(setCol).as("set"),
        graft.functions.TextFunctions.portableHash60(value.cast("string")).as("h"))
      .distinct()
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("set")).orderBy(col("h").asc)))
      .filter(col("__rn") <= k)
      .groupBy(col("set"))
      .agg(sort_array(collect_list(col("h"))).as("hs"))
  }

  /** Distinct-count estimate from a KMV sketch: (k−1)·2⁶⁰ div h_k when
    * the sketch is full, else the exact held count. DECIMAL(38) keeps
    * the 2⁶⁸-scale numerator exact (the oracle uses HUGEINT). */
  def kmvEstimate(sketch: DataFrame, k: Int = 128): DataFrame =
    sketch.select(col("set"),
      when(size(col("hs")) < k, size(col("hs")).cast("long"))
        .otherwise(expr(
          s"cast((cast($k as decimal(38,0)) - 1) * 1152921504606846976 div element_at(hs, $k) as bigint)"))
        .as("est_distinct"))

  /** Pairwise set-operation estimates from two KMV sketches, all
    * row-local array math: merge the k-mins (union sketch), estimate
    * |A∪B| from its k-th value, count merged values present in BOTH
    * input sketches → Jaccard in fixed-point permille and
    * |A∩B| ≈ j·|A∪B| div k. Exact when the union sketch is not full. */
  def kmvPairStats(pairs: DataFrame, k: Int = 128): DataFrame =
    pairs
      .withColumn("u", expr(s"slice(array_sort(array_union(hs_a, hs_b)), 1, $k)"))
      .withColumn("n_union_held", size(col("u")))
      .withColumn("n_both", expr(
        "size(filter(u, v -> array_contains(hs_a, v) AND array_contains(hs_b, v)))").cast("long"))
      .withColumn("est_union",
        when(col("n_union_held") < k, col("n_union_held").cast("long"))
          .otherwise(expr(
            s"cast((cast($k as decimal(38,0)) - 1) * 1152921504606846976 div element_at(u, $k) as bigint)")))
      .withColumn("jaccard_permille",
        expr(s"n_both * 1000 div n_union_held"))
      .withColumn("est_intersect",
        when(col("n_union_held") < k, col("n_both"))
          // decimal: n_both·est_union can reach 2⁶⁷ (k · hash-domain/h_k)
          .otherwise(expr(
            s"cast(cast(n_both as decimal(38,0)) * est_union div $k as bigint)")))
      .drop("u", "hs_a", "hs_b")
}
