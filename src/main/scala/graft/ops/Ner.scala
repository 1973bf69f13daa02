package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-TRAINED named-entity typing — the learned counterpart of the
  * rule stand-in for the reference's external entity producer (SURVEY.md
  * §2 B7; reference: participants/implementations.kt:264-284 maps
  * entityName → entityType via a remote NLP service). Same move as
  * ops/LangId (q84) and TF-IDF keyphrases (q86): replace the external
  * service with a model trained FROM the corpus itself, deterministic
  * and integer-exact so an independent engine replays training AND
  * inference bit-for-bit.
  *
  * The training signal is distant supervision (Mintz et al. 2009; the
  * gazetteer bootstrap of Collins & Singer 1999): a catalog of labeled
  * surface forms — here any (text, category) table, e.g. part names ×
  * part types — votes for each token's type distribution. Inference
  * tags each occurrence of a known token by integer context votes:
  * `score(position, type) = own_votes(token, type) + Σ votes of every
  * known token in the same text` — the text-window vote, with the
  * occurrence's own distribution counted twice (once directly, once in
  * the context sum) so local evidence outweighs an evenly-split
  * context. Ties break (score desc, type asc); no FP anywhere.
  *
  * Scale shape: the vote table is bounded by vocabulary × categories
  * (NOT corpus size), so it broadcasts no matter the input; training is
  * one explode + one hash-aggregate. Tagging shuffles only (id, type,
  * votes) pairs — two exchanges on the text id (context aggregate +
  * candidate join), never the raw text; the per-position argmax windows
  * over ≤ |categories| candidate rows.
  */
object Ner {

  /** Train: per-token integer type votes over a labeled-text corpus —
    * one row per (token, type) with its occurrence count. */
  def tokenVotes(labeled: DataFrame, textCol: String, typeCol: String): DataFrame =
    labeled
      .select(col(typeCol).as("ner_type"), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("tok"), col("ner_type"))
      .agg(count(lit(1)).as("votes"))

  /** The flat gazetteer view of a vote table: each known token mapped to
    * its majority type (votes desc, type asc) — the broadcastable
    * `Map(entityName → entityType)` shape of the reference's producer,
    * e.g. for seeding a pipeline Enricher. */
  def gazetteer(votes: DataFrame): DataFrame =
    votes
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("tok")).orderBy(col("votes").desc, col("ner_type").asc)))
      .filter(col("__rn") === 1)
      .select(col("tok"), col("ner_type"), col("votes"))

  /** Apply: tag every occurrence of a trained token in `docs` with its
    * context-voted type. Unknown tokens produce no row (no evidence —
    * the q84/Bpe domain stance). Returns (id, pos, tok, ner_type,
    * score). */
  def tag(docs: DataFrame, idCol: String, textCol: String,
      votes: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    // every (position, type) pair the occurrence's own token votes for
    val own = toks.join(broadcast(votes), Seq("tok"))
    // text-level context: total votes per type over all known tokens
    val ctx = own.groupBy(col("__id"), col("ner_type"))
      .agg(sum(col("votes")).as("ctx_votes"))
    // candidates = known-token positions × types present in their text;
    // a type the token itself never voted for can still win on context
    val known = toks.join(broadcast(votes.select(col("tok")).distinct()), Seq("tok"))
    known
      .join(ctx, Seq("__id"))
      .join(broadcast(votes.withColumnRenamed("votes", "own_votes")),
        Seq("tok", "ner_type"), "left")
      .na.fill(0L, Seq("own_votes"))
      .withColumn("score", col("own_votes") + col("ctx_votes"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__id"), col("pos"))
          .orderBy(col("score").desc, col("ner_type").asc)))
      .filter(col("__rn") === 1)
      .select(col("__id").as(idCol), col("pos"), col("tok"),
        col("ner_type"), col("score"))
  }
}
