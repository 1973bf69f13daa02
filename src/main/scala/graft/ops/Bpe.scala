package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE vocabulary induction (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — public algorithm):
  * learn the merge table a subword tokenizer runs, from the corpus
  * itself. The complement of the token-COUNTING surface (q18/q36): those
  * consume a vocabulary, this one trains it.
  *
  * Scale shape — the textbook reason BPE trains fine at 100 TB: the
  * corpus is scanned ONCE, into the word-TYPE frequency table
  * ([[wordFreqs]] — distinct words × count, a few GB for a web-scale
  * corpus), and every merge iteration then touches only that type table.
  * Each iteration is one explode-pairs + hash-aggregate + TakeOrdered(1)
  * over types; the winning pair (a single row) is the only thing that
  * ever reaches the driver, as the loop's control datum — the same O(1)
  * per-iteration driver traffic as [[Graph.pageRank]]'s iteration count.
  * The type table is localCheckpoint'd ONCE; merges apply lazily on top
  * (≤ nMerges chained row-local replaces per argmax pass — cheaper than
  * re-materializing the table every merge).
  *
  * Determinism: integer frequencies, argmax fully tie-broken (count
  * desc, then left/right symbol lexicographically), and greedy
  * left-to-right non-overlapping merge application — `replace` over the
  * `<sym>`-wrapped representation, which both this engine and the DuckDB
  * oracle implement with identical all-occurrence left-to-right scan
  * semantics, so an independent engine replays every merge bit-for-bit.
  *
  * Word model: whitespace tokens restricted to `^[a-z]+$` (symbol
  * alphabet and the `<`/`>` wrappers are then disjoint by construction);
  * no end-of-word marker — merges never cross word boundaries because
  * representations are per word type. Documented simplification of the
  * original's `</w>` convention.
  */
object Bpe {

  /** The one corpus pass: distinct lowercase-alpha word types with
    * occurrence counts. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Train `nMerges` BPE merges. Returns the merge table
    * (merge_rank, lhs, rhs, merged, cnt) in learning order — the exact
    * artifact a subword tokenizer loads. Stops early if the corpus runs
    * out of adjacent pairs (every type fully merged). */
  def train(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(nMerges >= 1, s"nMerges=$nMerges must be positive")

    // each word type as its wrapped symbol sequence: "hug" -> "<h><u><g>"
    var words = wordFreqs(docs, textCol)
      .select(col("freq"), regexp_replace(col("word"), "(.)", "<$1>").as("rep"))
      .localCheckpoint(true)

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      // adjacent symbol pairs of every type, weighted by type frequency
      val syms = split(expr("substring(rep, 2, length(rep) - 2)"), "><")
      val top = words
        .select(col("freq"), syms.as("s"))
        .select(col("freq"), explode(expr(
          "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1)," +
            " (a, b) -> struct(a, b))")).as("p"))
        .groupBy(col("p.a").as("l"), col("p.b").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, l + r, c))
        // LAZY merge application: each iteration's argmax action replays
        // the ≤ nMerges chained replaces over the checkpointed type
        // table — row-local string ops on a types-sized frame, cheaper
        // than re-materializing the table once per merge (which was a
        // full write+read pass per iteration; nMerges is ≤ 10 here and
        // bounded by the vocabulary budget in any deployment)
        words = words.select(col("freq"),
          replace(col("rep"), lit(s"<$l><$r>"), lit(s"<$l$r>")).as("rep"))
        rank += 1
      }
    }
    merges.result()
      .toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Tokenize with a LEARNED merge table (the apply half of the
    * train/apply pair): per document, the subword-token count its words
    * produce under the vocabulary, with the same greedy left-to-right
    * merge-order application the trainer used. `merges` is the driver-
    * side (lhs, rhs) list in merge_rank order — ≤ vocabulary size, the
    * one broadcast-scale datum of the operator; the corpus is tokenized
    * in a single narrow pass (explode words → chained `replace` → count
    * `<` wrappers), no shuffle before the per-document aggregate.
    * Documents with no `[a-z]+` word contribute no row (same domain as
    * [[wordFreqs]]). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val wrapped = regexp_replace(col("word"), "(.)", "<$1>")
    val rep = merges.foldLeft(wrapped) { case (e, (l, r)) =>
      replace(e, lit(s"<$l><$r>"), lit(s"<$l$r>"))
    }
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .select(col(idCol), (length(rep) - length(replace(rep, lit("<")))).as("n_sub"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
  }
}
