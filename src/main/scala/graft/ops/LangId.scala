package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-TRAINED language identification — the learned counterpart of
  * the stopword-profile heuristic (functions/TextFunctions.langId, q16):
  * train a character-trigram majority model from labeled documents, then
  * classify by trigram vote. Together with BPE (ops/Bpe.scala) this is
  * the train/apply pattern over the corpus itself: the model is a small
  * derived table, the corpus is never collected.
  *
  * Everything is integer-exact and fully tie-broken (majority lang per
  * trigram by count desc then lang asc; predicted lang per doc by votes
  * desc then lang asc), so an independent engine replays training AND
  * inference bit-for-bit — no log-probabilities, no FP.
  *
  * Scale shape: training is one explode + one hash-aggregate on
  * (trigram, lang) — the key space is bounded by charset³, not corpus
  * size, so the model table stays broadcastable no matter the input
  * (charset³ × langs rows); the per-trigram argmax windows over those
  * same bounded groups. Inference joins each document's trigrams to the
  * BROADCAST model and votes with one hash-aggregate per (doc, lang) —
  * one shuffle keyed by doc id.
  */
object LangId {

  /** All length-3 character substrings, empty below 3 chars. The
    * declarative transform(sequence, substring) form was O(len²) per
    * document (each substring call re-walks the char-indexed bytes) —
    * the suite's only super-linear 50× curve until round 12; the native
    * kernel ([[graft.functions.NativeExpressions.CharTrigrams]]) emits
    * the same char-semantics array in one byte walk. */
  private def trigrams(textCol: String) =
    graft.functions.NativeExpressions.charTrigrams(col(textCol))

  /** Train: (trigram, lang) — each trigram mapped to its majority
    * language over the labeled corpus. */
  def trigramModel(docs: DataFrame, textCol: String, langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // conditional spread (Dedup.spread): the trigram explode + partial
    // aggregate is CPU-dense narrow work that otherwise runs on the
    // compact scan's 1-2 tasks; corpus-scale inputs pass through
    Dedup.spread(docs.select(col(langCol).as("lang"), col(textCol)))
      .select(col("lang"), explode(trigrams(textCol)).as("g"))
      .groupBy(col("g"), col("lang")).agg(count(lit(1)).as("c"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("c").desc, col("lang").asc)))
      .filter(col("__rn") === 1)
      .select(col("g"), col("lang").as("model_lang"))
  }

  /** Apply: per document, the language with the most trigram votes under
    * `model` (ties to the lexicographically first language). Returns
    * (id, predicted, votes); documents shorter than 3 chars produce no
    * row (no trigram evidence — same domain stance as Bpe.encode). */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Dedup.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(trigrams(textCol)).as("g"))
      .join(broadcast(model), Seq("g"))
      .groupBy(col(idCol), col("model_lang")).agg(count(lit(1)).as("votes"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("votes").desc, col("model_lang").asc)))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("model_lang").as("predicted"), col("votes"))
  }
}
