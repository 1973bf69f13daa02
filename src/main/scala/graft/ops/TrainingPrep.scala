package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Training-data preparation operators: deterministic dataset splits,
  * token-budget packing, and PII-style scrubbing — the steps between
  * "deduped corpus" and "training batches" in a large-scale pipeline.
  *
  * All three are deterministic pure functions of the data (no RNG state,
  * no driver decisions), so they reshard/re-run identically at any scale
  * and are verified by exact SQL oracles.
  */
object TrainingPrep {

  /** Deterministic train/val/test assignment by hashing a stable key:
    * pct = portableHash60(key) mod 100, split by cumulative thresholds.
    * Hash-based (not row-number-based) so membership is stable under
    * re-partitioning, appends, and distributed re-runs — the standard
    * leakage-safe split discipline. */
  def splitAssign(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val pct = TextFunctions.portableHash60(key.cast("string")) % 100
    when(pct < trainPct, "train")
      .when(pct < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Sequential token-budget packing: documents in stable (blockCol,
    * orderCol) order are assigned to packs by their starting offset in the
    * cumulative token stream — `pack_id = (cumsum - n_tokens) div budget`.
    * The window is PER BLOCK, so at 100 TB each block packs independently
    * (no global sort); blocks map to training shards. */
  def packByTokens(df: DataFrame, blockCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(blockCol)).orderBy(col(orderCol))
    df.withColumn("cum", sum(col(tokensCol)).over(w))
      .withColumn("pack_id", expr(s"(cum - $tokensCol) div $budget"))
      .drop("cum")
  }

  /** Seeded deterministic training-order shuffle key: h =
    * portableHash60(seed ‖ ':' ‖ key). The full shuffle convention is
    * shard = h mod S, within-shard order = (h, key) — a reproducible
    * global permutation computed with ONE exchange (the shard hash
    * partition) and a SHARD-partitioned rank window; no global sort, no
    * driver state. Changing the seed re-deals the entire permutation
    * (per-epoch reshuffles), while any slice of it replays bit-for-bit
    * on any cluster layout — the property a 100 TB training run needs
    * from its data order (resume mid-epoch, re-materialize one lost
    * shard, audit what batch k contained). */
  def shuffleHash(key: Column, seed: String): Column =
    TextFunctions.portableHash60(concat(lit(seed), lit(":"), key.cast("string")))

  /** Scrub numeric tokens (the offline stand-in for PII redaction —
    * emails/phones/SSNs are digit-bearing patterns; the synthetic corpus
    * has plain numbers). Global regexp_replace, no UDF. */
  def scrubNumbers(text: Column, replacement: String = "<num>"): Column =
    regexp_replace(text, "[0-9]+", replacement)

  /** PII patterns for [[scrubPii]]/[[piiCounts]] — the Dolma/CCNet-style
    * release-gate redaction (emails, IPv4 literals, international-format
    * phone numbers). Deliberately simple character-class regexes with no
    * engine-specific syntax: Java (Spark codegen) and RE2 (the DuckDB
    * oracle) match them identically, so the scrub is replayable
    * bit-for-bit by an independent engine. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9][0-9-]{7,}[0-9]"

  /** Redact PII in place: emails → `<email>`, THEN IPv4 → `<ip>`, THEN
    * phones → `<phone>` (email first — its local/domain parts contain
    * dotted digit runs an IP pass would half-eat). One narrow projection,
    * no shuffle: scrubbing 100 TB is a map-only pass. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      text, EmailRe, "<email>"), Ipv4Re, "<ip>"), PhoneRe, "<phone>")

  /** Per-row PII hit counts (n_emails, n_ips, n_phones) as a struct —
    * the detection census a release gate reports before scrubbing. */
  def piiCounts(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<email>")
    struct(
      regexp_count(text, lit(EmailRe)).as("n_emails"),
      // count on the email-scrubbed text, mirroring the scrub order
      regexp_count(noEmail, lit(Ipv4Re)).as("n_ips"),
      regexp_count(regexp_replace(noEmail, Ipv4Re, "<ip>"), lit(PhoneRe))
        .as("n_phones"))
  }

  /** Deterministic mixture sampling: keep each row with its source's
    * target fraction — the dataset-mixing step that turns raw corpus
    * proportions into the training mixture. Membership is a pure function
    * of (key, fraction): portable-hash of the salted key mod 1e6 under
    * the source's threshold, so the sample is reproducible across
    * engines, resharding, and appends (no RNG, no sampleBy seed drift),
    * and downsampling a source further keeps a SUBSET of the previous
    * sample (thresholds nest). The per-source threshold table broadcasts;
    * the corpus streams through one narrow filter — no shuffle. Unknown
    * sources fall back to `defaultFraction`. */
  def mixtureSample(df: DataFrame, keyCol: String, sourceCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val thresholds = fractions.toSeq.toDF(sourceCol, "frac")
      .select(col(sourceCol), round(col("frac") * 1000000).cast("long").as("mix_thresh"))
    df.join(broadcast(thresholds), Seq(sourceCol), "left_outer")
      .filter(graft.functions.TextFunctions.portableHash60(
        concat(col(keyCol).cast("string"), lit(":mix"))) % 1000000
        < coalesce(col("mix_thresh"), lit(math.round(defaultFraction * 1000000))))
      .drop("mix_thresh")
  }

  /** Deterministic exact-count stratified sampling: the k rows per
    * stratum with the SMALLEST portable hash of the salted key — the
    * reservoir-sampling result, reproducibly, with no RNG state. Growing
    * k keeps previous members (prefix property), and membership is a
    * pure function of the data — stable under resharding and re-runs.
    *
    * Scale shape: a naive `row_number() OVER (PARTITION BY stratum)`
    * shuffles the WHOLE table into one partition per stratum — with few
    * strata that is the textbook window skew-bomb. So phase 1 takes the
    * per-(stratum, salt-bucket) top-k (parallelism = strata × buckets),
    * shrinking the candidate set to ≤ buckets·k per stratum, and only
    * phase 2 ranks within the stratum — on the tiny survivor set. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      k: Int, saltBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = TextFunctions.portableHash60(
      concat(col(keyCol).cast("string"), lit(":strat")))
    val salted = df.withColumn("h", h)
      .withColumn("salt", pmod(col("h"), lit(saltBuckets.toLong)))
    val w1 = Window.partitionBy(col(strataCol), col("salt"))
      .orderBy(col("h"), col(keyCol))
    val w2 = Window.partitionBy(col(strataCol)).orderBy(col("h"), col(keyCol))
    salted
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= k)
      .withColumn("sample_rank", row_number().over(w2))
      .filter(col("sample_rank") <= k)
      .drop("r1", "salt", "h")
  }

  /** WEIGHTED sampling without replacement per stratum — priority
    * sampling (Duffield/Lund/Thorup, JACM 2007): each item gets priority
    * q = w / u with u uniform on (0,1]; the top-k by priority is the
    * sample. Heavier items are proportionally likelier to be drawn — the
    * length/quality-weighted corpus subsampling verb that unweighted q59
    * cannot express.
    *
    * Determinism contract: u comes from the portable 60-bit hash of the
    * item key (u ≈ (h+1)/2^60), so the priority is the exact integer
    * `w · 2^60 div (h+1)` — any engine replays every draw. Computed in
    * DECIMAL(38) and clamped at 2^62 (a priority that large needs
    * h < w·4, probability ~1e-17 per item — and the clamp is replayed on
    * both sides anyway) so the output column stays BIGINT.
    *
    * Scale: one narrow pass for (h, priority), one per-stratum top-k
    * window map-side-pruned by WindowGroupLimit — identical posture to
    * [[stratifiedSample]]. */
  def prioritySample(df: DataFrame, strataCol: String, keyCol: String,
      weightCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = TextFunctions.portableHash60(
      concat(col(keyCol).cast("string"), lit(":prio")))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("priority").desc, col(keyCol))
    df.withColumn("__h", h)
      .withColumn("priority", expr(
        s"cast(least(cast($weightCol as decimal(38,0)) * 1152921504606846976" +
          " div (__h + 1), 4611686018427387904) as bigint)"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .drop("__h")
  }

  /** Benchmark decontamination: flag training documents sharing any word
    * `n`-gram with an evaluation/benchmark document — the standard
    * train/test-overlap hygiene pass before LLM training.
    *
    * Scale shape: the benchmark side (eval suites) is tiny relative to a
    * 100 TB train corpus, so its distinct shingles BROADCAST and the train
    * side streams through a broadcast hash join — no shuffle of the
    * corpus, one narrow pass. Shingling is the one-pass native kernel
    * (distinct n-grams per doc); the join keys on the shingle string
    * itself, which keeps the operator engine-reproducible (a 64-bit
    * shingle hash would shrink the broadcast further at identical plan
    * shape). Returns one row per CONTAMINATED train doc:
    * (id, n_shared_shingles, first_bench_id). */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    def shingled(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
        explode(graft.functions.NativeExpressions.wordShingles(col(textCol), n)).as("sh"))
    shingled(train, "id")
      .join(broadcast(shingled(bench, "bench_id")), "sh")
      .groupBy(col("id"))
      .agg(count_distinct(col("sh")).as("n_shared_shingles"),
        min(col("bench_id")).as("first_bench_id"))
  }

  /** Per-EVAL-doc contamination overlap — the flip side of
    * [[decontaminate]] (which flags TRAIN docs). This is the
    * clean/dirty-split measurement the GPT-3 paper's Appendix C and its
    * successors (PaLM, Llama) publish with the model card: for every
    * benchmark document, what FRACTION of its distinct word n-grams
    * appears anywhere in the training corpus. A benchmark doc whose
    * grams are mostly covered by train text cannot honestly score the
    * model, whatever specific train doc leaked it.
    *
    * Scale shape: the bench side broadcasts (it is the small side by
    * definition — eval suites vs a 100 TB corpus), the train shingles
    * stream through the broadcast join UNSHUFFLED, and the only exchange
    * is the distinct-matched-gram rollup whose key space is bounded by
    * the eval suite's own shingle count (map-side partial aggregation
    * collapses the per-partition duplicate matches before they move).
    * Returns one row per bench doc — also for fully-clean ones
    * (n_overlap = 0), because the clean split is the point:
    * (bench_id, n_grams, n_overlap, overlap_micro = overlap fraction in
    * exact integer millionths). */
  def evalOverlap(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 4): DataFrame = {
    def shingled(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
        explode(graft.functions.NativeExpressions.wordShingles(col(textCol), n)).as("sh"))
    val benchSh = shingled(bench, "bench_id")
    // wordShingles emits DISTINCT shingles per doc: plain count = distinct
    val totals = benchSh.groupBy(col("bench_id")).agg(count(lit(1)).as("n_grams"))
    val matched = shingled(train, "id").select(col("sh"))
      .join(broadcast(benchSh), "sh")
      .select(col("bench_id"), col("sh")).distinct()
      .groupBy(col("bench_id")).agg(count(lit(1)).as("n_overlap"))
    totals.join(matched, Seq("bench_id"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("overlap_micro", expr("n_overlap * 1000000 div n_grams"))
  }

  /** BLOOM-FILTER decontamination — the fixed-size scale path for
    * `decontaminate`. The exact pass broadcasts the benchmark's distinct
    * shingle STRINGS; that broadcast grows with every added eval suite.
    * A Bloom filter (Bloom 1970) caps the shipped state at `mBits` bits
    * FOREVER — `k` bits per shingle, membership = all `k` bits set —
    * at the price of a deterministic, measurable false-positive rate
    * (conservative direction: a false positive only over-flags a
    * training doc, never leaks a benchmark ngram through).
    *
    * Everything is engine-replayable: bit positions come from the
    * portable 60-bit hash by double hashing (h₁ = h mod 2³⁰,
    * h₂ = (h div 2³⁰) | 1 — odd, so coprime with the power-of-two m;
    * posᵢ = (h₁ + i·h₂) mod m), and the filter itself is built
    * DISTRIBUTIVELY: per-word `bit_or` partial aggregates, m/32 words
    * total (1024 longs carrying 32 bits each at the default m = 2¹⁵ —
    * 32, not 64, so no engine ever shifts into the sign bit, which
    * DuckDB rejects as overflow), collected once and shipped back as a
    * literal array — the only driver touch is those 1024 words, by
    * construction constant-size at any corpus scale.
    *
    * Probe side: one narrow pass over the train shingles, k bit tests
    * per shingle against the literal array, per-doc distinct-hit count
    * — no join, no shuffle of the corpus beyond the per-doc rollup. */
  def bloomDecontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 4, mBits: Int = 1 << 15, k: Int = 3): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0, "mBits must be a power of two")
    require(k >= 1 && k <= 8, "1..8 probe bits")
    def shingles(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
        explode(graft.functions.NativeExpressions.wordShingles(col(textCol), n)).as("sh"))
    def posExpr(i: Int): String =
      s"(h % 1073741824L + ${i}L * ((h div 1073741824L) | 1L)) % ${mBits}L"

    val benchPos = shingles(bench, "bench_id").select(col("sh")).distinct()
      .select(graft.functions.TextFunctions.portableHash60(col("sh")).as("h"))
      .select(explode(expr(
        s"array(${(0 until k).map(posExpr).mkString(", ")})")).as("pos"))
    val built = benchPos
      .groupBy(expr("cast(pos div 32 as int)").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(pos % 32 as int)))").as("bits"))
      .collect()
    val bitWords = new Array[Long](mBits / 32)
    built.foreach(r => bitWords(r.getInt(0)) = r.getLong(1))

    def hitExpr(i: Int): String = {
      val p = posExpr(i)
      s"(shiftrightunsigned(element_at(bloom, cast(($p) div 32 as int) + 1)," +
        s" cast(($p) % 32 as int)) & 1L) = 1L"
    }
    shingles(train, "id")
      .withColumn("h", graft.functions.TextFunctions.portableHash60(col("sh")))
      .withColumn("bloom", typedLit(bitWords.toSeq))
      .filter(expr((0 until k).map(hitExpr).mkString(" AND ")))
      .groupBy(col("id"))
      // wordShingles emits DISTINCT shingles per doc, so a plain count is
      // already a distinct count — and saves the (id, sh) dedup exchange
      .agg(count(lit(1)).as("n_hit_shingles"))
  }

  /** Cross-document repeated-span measurement — the exact-substring
    * deduplication signal (the Lee et al. 2022 "Deduplicating Training
    * Data" observation: verbatim k-token spans repeated ACROSS documents
    * are the highest-value thing to remove from a pretraining corpus;
    * MinHash-style whole-doc similarity never sees them when the
    * containing documents differ).
    *
    * Per document: every positional k-word span, hashed portable-60
    * (string spans would work identically but ship k words per row
    * through the shuffle; the hash is the scale form and the oracle
    * replays it), counted across DISTINCT documents, and summarized as
    * (n_spans, n_repeated, repeated_micro = repeated fraction in exact
    * integer millionths). Documents shorter than k words report 0 spans.
    *
    * Scale shape: one shuffle keyed on the span hash with two-phase
    * distinct counting (map-side partials), then the repeated-hash set
    * joins back on the same key — no driver involvement; the per-doc
    * rollup re-keys on the doc id. A downstream pass can use the span
    * positions (exposed by `spanTable`) to actually cut the repeated
    * ranges; the measurement and the cut share the same index. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 10, minDocs: Int = 2): DataFrame = {
    // localCheckpoint, not persist: materialized once for its two
    // consumers, blocks released when the result frame is GC'd (a persist
    // held here leaks for the session — the bigramLm lesson)
    val spans = spanTable(docs, idCol, textCol, k).localCheckpoint(true)
    val repeated = spans.groupBy(col("span_hash"))
      .agg(count_distinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("span_hash"))
    val perDoc = spans
      .join(repeated, Seq("span_hash"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_repeated"))
    docs.select(col(idCol).as("id"),
      greatest(size(split(col(textCol), " ")) - (k - 1), lit(0)).cast("long").as("n_spans"))
      .join(perDoc, Seq("id"), "left_outer")
      .select(col("id"), col("n_spans"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        when(col("n_spans") > 0,
          expr("(coalesce(n_repeated, 0) * 1000000) div n_spans")).otherwise(lit(0L))
          .as("repeated_micro"))
  }

  /** The CUT that `repeatedSpans` measures: remove every word covered by
    * a cross-document repeated k-span and rebuild the document text —
    * Lee et al.'s actual dedup action (drop the verbatim repeated
    * substring, keep the unique remainder), not just its measurement.
    * Returns (id, n_kept, n_cut, clean_text); a fully-covered document
    * comes back with clean_text = '' rather than disappearing.
    *
    * Scale shape: the span index and repeated-hash set are the SAME
    * intermediates as repeatedSpans (shared spanTable); covered word
    * ordinals come from a bounded explode (k rows per repeated span,
    * distinct), the keep-filter is one anti-join on (id, idx), and text
    * rebuild is a hash aggregation collecting (idx, word) structs sorted
    * in-array — no per-group sort of the corpus, no windows. */
  def cutRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 10, minDocs: Int = 2): DataFrame = {
    val spans = spanTable(docs, idCol, textCol, k).localCheckpoint(true)
    val repeated = spans.groupBy(col("span_hash"))
      .agg(count_distinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("span_hash"))
    val covered = spans
      .join(repeated, Seq("span_hash"), "left_semi")
      .select(col("id"), explode(expr(s"sequence(pos, pos + ${k - 1})")).as("idx"))
      .distinct()
    val words = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("idx", "w")))
    val kept = words.join(covered, Seq("id", "idx"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        expr("array_join(transform(array_sort(collect_list(struct(idx, w))), s -> s.w), ' ')")
          .as("clean_text"))
    docs.select(col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("long").as("n_words"))
      .join(kept, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_cut"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** (id, pos, span_hash) for every positional k-word span — the shared
    * index behind `repeatedSpans` and any span-cutting rewrite. */
  def spanTable(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    // conditional spread: the k-span transform (slice + concat_ws per
    // span, then the md5 hash) is CPU-dense narrow work that otherwise
    // runs on the compact scan's 1-2 tasks; wide inputs pass through
    Dedup.spread(docs.select(col(idCol).as("id"), split(col(textCol), " ").as("ws")))
      .filter(size(col("ws")) >= k)
      .select(col("id"), posexplode(expr(
        s"transform(sequence(0, size(ws) - $k), i -> concat_ws(' ', slice(ws, i + 1, $k)))"))
        .as(Seq("pos", "span")))
      .select(col("id"), col("pos"),
        graft.functions.TextFunctions.portableHash60(col("span")).as("span_hash"))

  /** CCNet-style LM-perplexity quality bucketing (Wenzek et al. 2020:
    * score web documents against a reference-domain language model,
    * split head/middle/tail by perplexity terciles; the paper uses
    * KenLM — here the LM is the corpus-trainable integer bigram model
    * of q58, with surprisal in exact floor-log₂ bits so both engines
    * reproduce every score bit-for-bit):
    *
    *   bits(w₁→w₂) = ⌊log₂ c_ref(w₁)⌋ − ⌊log₂ c_ref(w₁w₂)⌋  (≥ 0 since
    *   c₁₂ ≤ c₁), or `unseenBits` when the reference never saw the
    *   bigram — the integer backoff.
    *
    * Per doc: mean surprisal in fixed-point micro-bits; buckets by
    * VALUE-tercile thresholds t₁ = percentile_disc(1/3) of the per-doc
    * averages (smallest value v with 3·|{avg ≤ v}| ≥ n), t₂ likewise at
    * 2/3 — equal scores always share a bucket, unlike an ntile split.
    *
    * Scale shape: the reference count tables are corpus-sized in
    * general, so scoring is a shuffle hash join on the bigram/unigram
    * key (map-side partial counts) — the q58 posture; per-doc
    * re-aggregation keys on the id. The tercile thresholds come from a
    * VALUE histogram of the integer averages via OrderStats.cumHistogram
    * (score granularity bounds the histogram at ≤ unseenBits·10⁶ rows,
    * but at that size even the histogram's running sum must not funnel
    * through one task — the bucketed two-level kernel keeps every window
    * bounded or partitioned), and re-join as a 1-row broadcast. The
    * histogram is eagerly materialized: it feeds both the total and the
    * threshold scan, and without the checkpoint each consumer would
    * replay the whole bigram-join pipeline. Docs with fewer than 2 words
    * carry no evidence and emit no row (the q58/q84/Bpe domain stance). */
  def lmQualityBuckets(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, unseenBits: Long = 20L): DataFrame = {
    // eager: the per-doc surprisal table (a corpus bigram explode + two
    // reference joins + an aggregate) feeds BOTH the tercile histogram
    // and the final bucket assignment — one row per doc, cheap to hold
    val perDoc = lmSurprisalPerDoc(docs, ref, idCol, textCol, unseenBits)
      .localCheckpoint(true)
    val hist = OrderStats.cumHistogram(perDoc.select(col("avg_micro")), "avg_micro")
      .localCheckpoint(true) // eager: total + threshold scan share one run
    val thr = hist
      .crossJoin(broadcast(hist.agg(sum(col("nv")).as("n")))) // 1-row total
      .agg(
        min(when(col("cum") * 3 >= col("n"), col("avg_micro"))).as("t1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("avg_micro"))).as("t2"))
    perDoc.crossJoin(broadcast(thr)) // 1-row thresholds
      .withColumn("bucket",
        when(col("avg_micro") <= col("t1"), 1)
          .when(col("avg_micro") <= col("t2"), 2).otherwise(3))
      .select(col(idCol), col("n_bigrams"), col("bits_total"),
        col("n_unseen"), col("avg_micro"), col("bucket"))
  }

  /** The per-document surprisal half of [[lmQualityBuckets]] — bigram
    * counts against the reference slice, exact floor-log₂ bits, the
    * fixed-point average — WITHOUT the tercile thresholds. Consumers
    * that aggregate the raw loss (q195's domain reweighting) use this
    * directly and skip the histogram/threshold pass they don't need. */
  def lmSurprisalPerDoc(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, unseenBits: Long = 20L): DataFrame = {
    def bigrams(df: DataFrame, extra: Seq[Column]): DataFrame = df
      .withColumn("__ws", split(col(textCol), " "))
      .filter(size(col("__ws")) >= 2)
      .select(extra :+ explode(expr(
        "transform(sequence(0, size(__ws) - 2)," +
          " i -> struct(element_at(__ws, i + 1) AS w1," +
          " concat(element_at(__ws, i + 1), ' ', element_at(__ws, i + 2)) AS bg))"))
        .as("__b"): _*)
      .select(extra :+ col("__b.w1").as("w1") :+ col("__b.bg").as("bg"): _*)
    val refUni = ref.select(explode(split(col(textCol), " ")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val refBg = bigrams(ref, Seq.empty)
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    bigrams(docs, Seq(col(idCol)))
      .join(refBg, Seq("bg"), "left")
      .join(refUni, Seq("w1"), "left")
      .withColumn("bits", when(col("c12").isNull, lit(unseenBits))
        .otherwise((length(bin(col("c1"))) - length(bin(col("c12")))).cast("long")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bits")).as("bits_total"),
        sum(when(col("c12").isNull, 1L).otherwise(0L)).as("n_unseen"))
      .withColumn("avg_micro", expr("bits_total * 1000000 div n_bigrams"))
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): rank a raw corpus
    * by how target-domain-like each document's HASHED n-gram feature
    * profile is, and keep the top k. Per feature bucket f (word bigrams
    * hashed into `buckets` cells — the hashing is what makes the model
    * CONSTANT-SIZE regardless of corpus scale, DSIR's central move):
    *
    *   w(f) = 64 + ⌊log₂(c_target(f)+1)⌋ − ⌊log₂(c_raw(f)+1)⌋
    *
    * — the integer floor-log₂ surrogate of DSIR's log p_t(f)/p_s(f)
    * (+1 Laplace smoothing; the corpus-size normalizers and the +64
    * offset shift every feature equally, so per-bigram-average ranking
    * is unchanged while every weight stays positive — which keeps the
    * fixed-point average away from engine-dependent negative integer
    * division). Doc score = mean feature weight in micro-bits; top-k by
    * (score desc, id asc), fully tie-broken.
    *
    * Scale shape: the weight table is ≤ `buckets` rows by construction
    * → broadcast; scoring is one corpus pass + per-doc hash-aggregate;
    * selection is TakeOrdered (no global sort). Raw docs with < 2 words
    * carry no evidence and are never selected. */
  def importanceSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096, k: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def feats(df: DataFrame, extra: Seq[Column]): DataFrame = df
      .withColumn("__ws", split(col(textCol), " "))
      .filter(size(col("__ws")) >= 2)
      .select(extra :+ explode(expr(
        "transform(sequence(0, size(__ws) - 2)," +
          " i -> concat(element_at(__ws, i + 1), ' ', element_at(__ws, i + 2)))"))
        .as("bg"): _*)
      .select(extra :+ pmod(TextFunctions.portableHash60(col("bg")), lit(buckets)).as("f"): _*)
    val ct = feats(target, Seq.empty).groupBy(col("f")).agg(count(lit(1)).as("ct"))
    val cs = feats(raw, Seq.empty).groupBy(col("f")).agg(count(lit(1)).as("cs"))
    // raw-side features are the scoring domain; target-only cells can
    // never be probed by a raw document
    val weights = cs.join(ct, Seq("f"), "left")
      .select(col("f"), (lit(64)
        + length(bin(coalesce(col("ct"), lit(0L)) + 1))
        - length(bin(col("cs") + 1))).cast("long").as("wb"))
    feats(raw, Seq(col(idCol)))
      .join(broadcast(weights), Seq("f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("wb")).as("bits_total"))
      .withColumn("avg_micro", expr("bits_total * 1000000 div n_bigrams"))
      .orderBy(col("avg_micro").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("avg_micro").desc, col(idCol).asc)))
  }

  /** Token-distribution DRIFT between two corpus slices — the data-ops
    * monitor that catches an ingest change (new crawl source, template
    * shift, generator regression) before it reaches training: per
    * token, the chi-square homogeneity contribution of its count split
    * between slice a and slice b. With d = o_a·N − (o_a+o_b)·N_a (and
    * the b-side residual = −d exactly),
    *
    *   χ²(t)·10⁶ = d²·10⁶ div (N·c·N_a) + d²·10⁶ div (N·c·N_b)
    *
    * — pure integer arithmetic in DECIMAL(38) (d² alone reaches ~10²²
    * at sf0.1; the oracle uses HUGEINT), no ln/FP anywhere, so every
    * contribution replays bit-for-bit. PSI would need logarithms; the
    * chi-square statistic is the rational-arithmetic drift measure.
    *
    * Scale shape: ONE corpus pass — explode + a single (token)
    * hash-aggregate with conditional counts (no join between the
    * slices) — then the 1-row totals broadcast back. Output is
    * vocabulary-sized, never corpus-sized. */
  def tokenDriftChiSq(docs: DataFrame, labelCol: String, textCol: String,
      labelA: String, labelB: String): DataFrame = {
    val counts = docs
      .filter(col(labelCol).isin(labelA, labelB))
      .select(col(labelCol).as("__l"), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token"))
      .agg(
        sum(when(col("__l") === labelA, 1L).otherwise(0L)).as("o_a"),
        sum(when(col("__l") === labelB, 1L).otherwise(0L)).as("o_b"))
    val totals = counts.agg(
      sum(col("o_a")).as("na"), sum(col("o_b")).as("nb"))
    counts.crossJoin(broadcast(totals)) // 1-row totals
      .withColumn("__d", expr(
        "cast(o_a as decimal(38,0)) * (na + nb) - (o_a + o_b) * na"))
      .withColumn("chi2_e6", expr(
        """cast(
          |  __d * __d * 1000000 div ((na + nb) * (o_a + o_b) * na) +
          |  __d * __d * 1000000 div ((na + nb) * (o_a + o_b) * nb)
          |as bigint)""".stripMargin))
      .select(col("token"), col("o_a"), col("o_b"), col("chi2_e6"))
  }
}
