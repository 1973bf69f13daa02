package graft

import org.apache.spark.sql.functions._
import graft.ops.TextSearch

/** BM25 inverted-index retrieval (ops.TextSearch). */
class TextSearchSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "spark spark spark fast table"),       // tf(spark)=3, short
      (2L, "spark table row value key line sort fast big small the a batch merge"), // tf(spark)=1, long
      (3L, "vector vector merge"),                // rare terms, very short
      (4L, "table row value key"),                // no query terms
      (5L, "spark vector")                        // two query terms
    ).toDF("doc_id", "text")
  }

  test("bm25 ranks term-dense short docs first and excludes non-matching docs") {
    val res = TextSearch.bm25TopK(corpus, "doc_id", "text",
      Seq("spark", "vector", "merge"), k = 10).collect()
    val ids = res.map(_.getLong(0))
    assert(!ids.contains(4L), "doc without query terms must not appear")
    assert(ids.length == 4)
    // independently recomputed fixed-point scores (same formula, Python):
    // doc3 3942377600000 > doc5 2868722444808 > doc2 1310261091348 >
    // doc1 1148825459530 — doc 3's two rare-term hits in a 3-token doc win;
    // doc 1's tf=3 of a common term in a short doc still loses to doc 2's
    // two-term hit
    assert(ids.sameElements(Array(3L, 5L, 2L, 1L)), s"got ${ids.toSeq}")
    val scores = res.map(_.getLong(1))
    assert(scores.sameElements(Array(3942377600000L, 2868722444808L,
      1310261091348L, 1148825459530L)), s"got ${scores.toSeq}")
  }

  test("bm25 tf saturation: more occurrences raise the score sublinearly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark aaa bbb ccc ddd eee fff ggg"),
      (2L, "spark spark bbb ccc ddd eee fff ggg"),
      (3L, "spark spark spark spark ddd eee fff ggg")
    ).toDF("doc_id", "text")
    val res = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(1L) < res(2L) && res(2L) < res(3L), s"monotone in tf: $res")
    val d12 = res(2L) - res(1L)
    val d23 = res(3L) - res(2L)
    assert(d23 < 2 * d12, s"saturating gains expected: $res")
  }

  test("postings + termStats form a consistent inverted index") {
    val p = TextSearch.postings(corpus, "doc_id", "text").cache()
    val stats = TextSearch.termStats(p).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(stats("spark") == ((3L, 5L)), s"spark df/total_tf: ${stats.get("spark")}")
    assert(stats("vector") == ((2L, 3L)))
    // postings tf matches a direct recount for one (term, doc)
    val tf = p.filter(col("term") === "spark" && col("doc_id") === 1L)
      .select(col("tf")).collect().head.getLong(0)
    assert(tf == 3L)
    p.unpersist()
  }

  test("q45 plan: corpus is not exchanged — only tiny aggregates shuffle") {
    val plan = TextSearch.bm25TopK(corpus, "doc_id", "text",
      Seq("spark", "vector"), 5).queryExecution.executedPlan.toString
    // df and stats joins must arrive broadcast, not as sort-merge joins
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no sort-merge join expected:\n$plan")
  }
}
