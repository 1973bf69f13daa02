package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-derived POS tagging — the trainable upgrade of the B6
  * parse-map stand-in (SURVEY.md §2 B6; reference CoreNLP producer,
  * participants/implementations.kt:92-146): a trigram HMM in the
  * max-sum semiring over integer fixed-point weights, decoded per
  * sentence with exact Viterbi. Same corpus-trained stance as
  * ops/LangId (q84) / ops/Ner (q91): the "annotator" is bootstrapped
  * from the corpus itself (here: self-training over the deterministic
  * rule tagger's weak labels — the classic HMM bootstrap), and every
  * number is integer-exact so an independent engine can replay train
  * AND decode bit-for-bit.
  *
  * Weights are fixed-point conditional frequencies (the q86 integer-idf
  * convention, floor division):
  *   emit_e6(w, t)      = c(w, t)·10⁶ div c(t)
  *   trans_e6(t₁,t₂→t₃) = c(t₁,t₂,t₃)·10⁶ div c(t₁,t₂)
  * with sentence-start padding tag `^`. Decode maximizes the SUM of
  * weights along the tag path (max-sum Viterbi; unseen pairs weigh 0,
  * not -∞, so every path stays admissible), ties broken by the
  * lexicographically smallest tag string — which the DP preserves
  * exactly: prefixes that tie in score at a state share all suffix
  * options, so keeping the lex-min prefix per state is sufficient.
  *
  * Scale shape: both model tables are bounded by vocabulary × tags
  * (emissions) and tags³ (transitions) — NOT corpus size — so they
  * collect/broadcast like Ner's gazetteer and Bpe's merge table.
  * Training is two hash-aggregates over one corpus pass (the trigram
  * window partitions by sentence, the same exchange the decode reuses);
  * decode shuffles (id, sent) groups once and runs O(len·|T|²) per
  * sentence with the model maps on the executors.
  */
object PosTag {

  val Bos = "^"
  private val E6 = 1000000L

  /** (id, sent, pos, w, tag): `ruleTag`-weak-labeled words in `sentLen`
    * framing — the shared shape of training and rule-replay. */
  def labeledWords(docs: DataFrame, idCol: String, textCol: String,
      ruleTag: Column => Column, sentLen: Int = 7): DataFrame =
    docs
      .select(col(idCol).as("id"), posexplode(split(col(textCol), " ")).as(Seq("idx", "w")))
      .withColumn("sent", expr(s"idx div $sentLen"))
      .withColumn("pos", expr(s"idx % $sentLen"))
      .withColumn("tag", ruleTag(col("w")))
      .drop("idx")

  /** Train emissions: (w, tag, emit_e6) with emit_e6 = c(w,t)·10⁶ div c(t). */
  def emissions(words: DataFrame): DataFrame = {
    // eager: model-sized (vocab × tags), feeds its own rollup + the join
    val cwt = words.groupBy(col("w"), col("tag")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // c(t) = Σ_w c(w,t): roll up the fine table instead of re-scanning
    // the corpus words a second time — one pass, identical counts
    val ct = cwt.groupBy(col("tag")).agg(sum(col("c")).as("ct"))
    cwt.join(ct, Seq("tag"))
      .select(col("w"), col("tag"), expr(s"c * $E6 div ct").as("emit_e6"))
  }

  /** Train transitions: (t1, t2, t3, trans_e6) over sentence tag
    * trigrams with `^` start padding; trans_e6 = c₃·10⁶ div c₂. */
  def transitions(words: DataFrame): DataFrame = {
    val sw = Window.partitionBy(col("id"), col("sent")).orderBy(col("pos"))
    val tri = words.select(
      coalesce(lag(col("tag"), 2).over(sw), lit(Bos)).as("t1"),
      coalesce(lag(col("tag"), 1).over(sw), lit(Bos)).as("t2"),
      col("tag").as("t3"))
    // eager: model-sized (≤ tags³), feeds its own rollup + the join
    val c3 = tri.groupBy(col("t1"), col("t2"), col("t3")).agg(count(lit(1)).as("c3"))
      .localCheckpoint(true)
    // c₂(t1,t2) = Σ_t3 c₃: every trigram row lands in exactly one
    // (t1,t2) prefix, so the bigram table is a rollup of the trigram
    // table — the corpus-wide lag window runs ONCE instead of twice
    val c2 = c3.groupBy(col("t1"), col("t2")).agg(sum(col("c3")).as("c2"))
    c3.join(c2, Seq("t1", "t2"))
      .select(col("t1"), col("t2"), col("t3"), expr(s"c3 * $E6 div c2").as("trans_e6"))
  }

  /** Exact max-sum Viterbi over one sentence. Returns (tag path, score);
    * ties: score desc then path asc, preserved state-locally (see class
    * doc). */
  private[graft] def viterbi(ws: Seq[String], tags: Seq[String],
      emit: Map[(String, String), Long],
      trans: Map[(String, String, String), Long]): (String, Long) = {
    if (ws.isEmpty) return ("", 0L)
    def e(w: String, t: String) = emit.getOrElse((w, t), 0L)
    def tr(a: String, b: String, c: String) = trans.getOrElse((a, b, c), 0L)
    var states: Map[(String, String), (Long, String)] =
      tags.map(t => (Bos, t) -> (tr(Bos, Bos, t) + e(ws.head, t), t)).toMap
    for (i <- 1 until ws.length) {
      val next = scala.collection.mutable.Map.empty[(String, String), (Long, String)]
      for (((a, b), (s, p)) <- states; c <- tags) {
        val sc = s + tr(a, b, c) + e(ws(i), c)
        val np = p + " " + c
        next.get((b, c)) match {
          case Some((s0, p0)) if s0 > sc || (s0 == sc && p0 <= np) => ()
          case _ => next((b, c)) = (sc, np)
        }
      }
      states = next.toMap
    }
    val (s, p) = states.values.minBy { case (sc, path) => (-sc, path) }
    (p, s)
  }

  /** Decode every `sentLen`-word sentence of `docs` with the trained
    * model. `idCol` must be an integral id. Output: (idCol, sent,
    * n_words, tags, score_e6). The model frames collect to driver maps —
    * bounded by vocab × tags / tags³ by construction (never corpus
    * size) — and ship to executors in the closure. */
  def decode(docs: DataFrame, idCol: String, textCol: String,
      emitDf: DataFrame, transDf: DataFrame, sentLen: Int = 7): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val emitM = emitDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val transM = transDf.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val tags = emitM.keysIterator.map(_._2).toSeq.distinct.sorted
    val sents = docs
      .select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("idx", "w")))
      .groupBy(col("id"), expr(s"idx div $sentLen").as("sent"))
      .agg(expr("transform(array_sort(collect_list(struct(idx, w))), s -> s.w)").as("ws"))
      .as[(Long, Long, Seq[String])]
      // AQE right-sizes the sentence aggregate by BYTES, which coalesces
      // these narrow rows onto a few tasks — but Viterbi cost is per ROW
      // (O(tags³) per word, interpreted), so the decode was serializing
      // onto 2-3 cores. Round-robin widen to the machine; the shuffled
      // rows are (id, sent, words) — tiny next to the decode they buy.
      .repartition(spark.sparkContext.defaultParallelism * 2)
    sents.map { case (id, sent, ws) =>
      val (path, score) = viterbi(ws, tags, emitM, transM)
      (id, sent, ws.length, path, score)
    }.toDF(idCol, "sent", "n_words", "tags", "score_e6")
  }
}
