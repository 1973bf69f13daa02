package graft

import graft.ops.LangId

/** Corpus-trained trigram language ID (ops.LangId) against hand-computed
  * models and votes. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("trains the majority model and classifies by vote, ties lexicographic") {
    val train = Seq(
      (10L, "aaaa", "en"), // aaa x2 for en
      (11L, "bbbb", "de"), // bbb x2 for de
      (12L, "aaab", "de"), // aaa for de (outvoted 2-1), aab for de
      (13L, "ccc", "en"),  // ccc 1-1 en/de: majority tie -> 'de' (lex)
      (14L, "ccc", "de")
    ).toDF("doc_id", "text", "lang")
    val model = LangId.trigramModel(train, "text", "lang")
    val m = model.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(m == Map("aaa" -> "en", "aab" -> "de", "bbb" -> "de", "ccc" -> "de"), m)

    val docs = Seq(
      (1L, "aaabbbb"), // aaa->en 1; aab->de 1; abb unmodeled; bbb->de 2  => de, 3
      (2L, "aaaa"),    // aaa x2 -> en, 2
      (3L, "bbbaaa"),  // bbb->de 1; bba/baa unmodeled; aaa->en 1: tie -> de
      (4L, "xy")       // shorter than a trigram: no row
    ).toDF("doc_id", "text")
    val got = LangId.classify(docs, "doc_id", "text", model).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "de", 3L), (2L, "en", 2L), (3L, "de", 1L)),
      got.mkString(", "))
  }
}
