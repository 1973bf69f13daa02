package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-TRAINED text classification — the model-based filter stage of
  * modern training-data pipelines (CCNet/GPT-3-style corpora filter with a
  * fastText-family linear classifier over bags of words; the heuristic
  * stage is q17, the LM-perplexity stage q93, DSIR importance q94 — this
  * closes the trio with the supervised-classifier stage). The reference
  * engine's enrichment loop attaches exactly this kind of per-document
  * label metadata (reference:
  * pipeline/src/main/kotlin/participants/implementations.kt:229-262, the
  * Azure language/classification producer shape).
  *
  * Model = multinomial Naive Bayes with Laplace smoothing, trained and
  * applied entirely in integer floor-log₂ fixed point (the q93/q94
  * convention: `length(bin(n))` IS 1 + ⌊log₂ n⌋, bit counting, never an FP
  * log) so every score replays bit-for-bit in the oracle:
  *
  *   bits(w, c)  = 64 + ⌊log₂(c_wc + 1)⌋ − ⌊log₂(T_c + V)⌋
  *   prior(c)    = ⌊log₂(D_c + 1)⌋
  *   score(d, c) = prior(c) + Σ_{w ∈ d, w ∈ vocab} bits(w, c)
  *
  * with c_wc = count of token w in class-c training text, T_c = class-c
  * token total, V = training vocabulary size, D_c = class-c training doc
  * count. The +64 offset keeps every per-token weight positive (the q94
  * stance — no engine-dependent negative integer division anywhere), and
  * shifts every class equally per in-vocab token, so the argmax is the NB
  * argmax. Prediction = max score, ties broken by LARGER label — the
  * (score, label) order is total, evaluated by the hash-aggregable
  * ArgMaxByOrd kernel (one aggregate, no window, no nondeterministic
  * `max_by`, no SortAggregate fallback).
  *
  * Scale shape: the model is a dense (vocab × classes) grid — Heaps-law
  * bounded rows × a constant class count, broadcastable at any corpus
  * scale (at 100 TB the vocab grows ~n^0.5 while the corpus grows ~n).
  * Training is two map-side-combined aggregations over one corpus pass;
  * apply is a broadcast join per token plus one (doc, class) hash
  * aggregate and one per-doc max — shuffle keys are (id, label) then id,
  * never text. Out-of-vocabulary tokens carry no evidence and are dropped
  * by the inner join; documents with NO in-vocabulary token emit no row
  * (the q58/q84 domain stance).
  */
object Classify {

  private def tokens(df: DataFrame, extra: Seq[Column], textCol: String): DataFrame = {
    // conditional spread (Dedup.spread) before the explode + aggregate:
    // the compact corpus scan arrives in 1-2 splits and the tokenize +
    // partial-count is CPU-dense; corpus-scale inputs pass through
    val base = Dedup.spread(df.select(extra :+ col(textCol).as("__t"): _*))
    val keep = base.columns.filterNot(_ == "__t").map(col)
    base.select(keep :+ explode(split(col("__t"), " ")).as("w"): _*)
  }

  /** The trained model: one row per (label, w) over the DENSE
    * vocab × classes grid, with the per-token evidence `bits` and the
    * class `prior_bits` repeated on every row (the grid is the broadcast
    * unit; carrying the prior denormalized keeps apply to a single join).
    */
  def nbTrain(train: DataFrame, labelCol: String, textCol: String): DataFrame = {
    val toks = tokens(train, Seq(col(labelCol).as("label"), col("train_doc_id")), textCol)
    // ONE corpus pass: the (label, doc, word) counts are materialized once
    // (training IS a materialization step) and every model statistic —
    // class totals, doc counts, per-word counts, vocabulary — derives from
    // that bounded frame. Without the checkpoint each statistic re-plans
    // its own scan of the training corpus (Catalyst reshapes the shared
    // aggregate per consumer, so ReusedExchange never fires); with it the
    // corpus is read exactly once however many statistics follow — the
    // connected-components checkpoint posture applied to model training.
    val cdw = toks.groupBy(col("label"), col("train_doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val cls = cdw.groupBy(col("label")).agg(
      sum(col("c")).as("tc"),
      countDistinct(col("train_doc_id")).as("dc"))
    val wc = cdw.groupBy(col("label"), col("w")).agg(sum(col("c")).as("cwc"))
    val vocab = cdw.select(col("w")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))
    // dense grid: every (class, vocab word) cell, zero-count cells smoothed
    broadcast(cls).crossJoin(vocab)
      .crossJoin(broadcast(vSize)) // 1-row vocab size
      .join(wc, Seq("label", "w"), "left")
      .select(col("label"), col("w"),
        (lit(64) + length(bin(coalesce(col("cwc"), lit(0L)) + 1))
          - length(bin(col("tc") + col("v")))).cast("long").as("bits"),
        (length(bin(col("dc") + 1)) - 1).cast("long").as("prior_bits"))
  }

  /** Classify `test` docs against the model trained on `train`. Output:
    * (id, n_vocab_tokens, pred_label, score_bits, actual, hit), one row
    * per test doc that shares ≥ 1 token with the training vocabulary. */
  /** The per-(doc, class) score table shared by [[nbClassify]] and
    * [[nbClassifyMargin]]: one row per (test doc, class) with the full
    * integer NB score. */
  private def nbScores(train: DataFrame, test: DataFrame, labelCol: String,
      idCol: String, textCol: String): DataFrame = {
    val model = nbTrain(
      train.withColumn("train_doc_id", col(idCol)), labelCol, textCol)
    // `actual` rides in the GROUPING KEYS, not as min(string): it is
    // functionally dependent on the doc id (no extra groups), and a
    // string-valued aggregate would force the whole aggregation to
    // SortAggregate — HashAggregate only takes mutable-buffer functions
    tokens(
        test.select(col(idCol), col(labelCol).as("actual"), col(textCol)),
        Seq(col(idCol), col("actual")), textCol)
      .join(broadcast(model), Seq("w"))
      .groupBy(col(idCol), col("actual"), col("label"))
      .agg(count(lit(1)).as("n_vocab_tokens"),
        (sum(col("bits")) + min(col("prior_bits"))).as("score_bits"))
  }

  def nbClassify(train: DataFrame, test: DataFrame, labelCol: String,
      idCol: String, textCol: String): DataFrame = {
    val scored = nbScores(train, test, labelCol, idCol, textCol)
    // per-doc argmax via the hash-aggregable ArgMaxByOrd kernel ordered by
    // (score, label) — max(struct(...)) would be the same total order but
    // plans as SortAggregate (struct buffers aren't hash-aggregable), the
    // exact fallback RewriteMaxBy exists to avoid; the winner's score is
    // max(score_bits) since ties share it
    scored
      .groupBy(col(idCol), col("actual"))
      .agg(
        graft.functions.NativeExpressions.argMaxBy(
          col("label"), col("score_bits"), col("label")).as("pred_label"),
        max(col("score_bits")).as("score_bits"),
        min(col("n_vocab_tokens")).as("n_vocab_tokens")) // same for every class
      .select(col(idCol),
        col("n_vocab_tokens"),
        col("pred_label"),
        col("score_bits"),
        col("actual"),
        when(col("pred_label") === col("actual"), 1).otherwise(0)
          .cast("int").as("hit"))
  }

  /** [[nbClassify]] plus the decision MARGIN — winner bits minus
    * runner-up bits under the same (score DESC, label DESC) total order —
    * the integer confidence proxy a margin-calibration eval stratifies
    * accuracy by (the model-ops answer to "can I trust the filter at
    * threshold X"). A two-way score tie margins 0; the class count is a
    * constant, so the ranked table is (test docs × classes) rows and the
    * per-doc window is partitioned. */
  def nbClassifyMargin(train: DataFrame, test: DataFrame, labelCol: String,
      idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = nbScores(train, test, labelCol, idCol, textCol)
      .withColumn("rn", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("score_bits").desc, col("label").desc)))
      .localCheckpoint(true) // winner + runner-up consumers
    val w1 = ranked.filter(col("rn") === 1)
      .select(col(idCol), col("label").as("pred_label"),
        col("score_bits").as("__s1"), col("actual"))
    val w2 = ranked.filter(col("rn") === 2)
      .select(col(idCol), col("score_bits").as("__s2"))
    w1.join(w2, Seq(idCol), "left")
      .select(col(idCol), col("pred_label"), col("actual"),
        (col("__s1") - coalesce(col("__s2"), col("__s1"))).as("margin_bits"),
        when(col("pred_label") === col("actual"), 1).otherwise(0)
          .cast("int").as("hit"))
  }
}
