package graft

import org.apache.spark.sql.functions._
import graft.ops.PosTag

/** Trigram-HMM max-sum Viterbi (B6 upgrade): fixed-point training
  * tables and exact decode on hand-computed fixtures. */
class PosTagSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the max-sum path, not the greedy one") {
    // pos0 ties A/B on local evidence; the transition out of A is worth
    // 9 vs 1, so the optimal path starts A even though greedy sees a tie
    val emit = Map(("x", "A") -> 5L, ("x", "B") -> 5L)
    val trans = Map(
      ("^", "^", "A") -> 10L, ("^", "^", "B") -> 10L,
      ("^", "A", "B") -> 9L, ("^", "A", "A") -> 1L)
    val (path, score) = PosTag.viterbi(Seq("x", "y"), Seq("A", "B"), emit, trans)
    assert(path === "A B" && score === 24L)
  }

  test("viterbi ties break to the lexicographically smallest tag string") {
    val (path, score) = PosTag.viterbi(Seq("x", "y", "z"), Seq("B", "A"),
      Map.empty, Map.empty)
    assert(path === "A A A" && score === 0L)
  }

  test("emissions and transitions are exact fixed-point conditional frequencies") {
    // "the cat the dog" tagged DT NN DT NN (sentLen 4 → one sentence)
    val docs = Seq((1L, "the cat the dog")).toDF("doc_id", "text")
    val words = PosTag.labeledWords(docs, "doc_id", "text",
      graft.functions.TextFunctions.posTag, sentLen = 4)
    val em = PosTag.emissions(words).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // c(the,DT)=2, c(DT)=2 → 1e6; c(cat,NN)=1, c(NN)=2 → 500000
    assert(em(("the", "DT")) === 1000000L)
    assert(em(("cat", "NN")) === 500000L)
    assert(em(("dog", "NN")) === 500000L)
    val tr = PosTag.transitions(words).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    // trigrams: (^,^,DT) (^,DT,NN) (DT,NN,DT) (NN,DT,NN) — each ctx unique
    assert(tr(("^", "^", "DT")) === 1000000L)
    assert(tr(("^", "DT", "NN")) === 1000000L)
    assert(tr(("DT", "NN", "DT")) === 1000000L)
    assert(tr(("NN", "DT", "NN")) === 1000000L)
  }

  test("decode equals brute-force enumeration of every tag path (independent algorithm)") {
    val docs = Seq(
      (1L, "the cat runs fast and the dog sleeps now"),
      (2L, "a bird sings the worm turns quickly to dust")
    ).toDF("doc_id", "text")
    val rule = graft.functions.TextFunctions.posTag _
    val words = PosTag.labeledWords(docs, "doc_id", "text", rule)
    val emitDf = PosTag.emissions(words)
    val transDf = PosTag.transitions(words)
    val emit = emitDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val trans = transDf.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val tags = emit.keysIterator.map(_._2).toSeq.distinct.sorted

    def brute(ws: Seq[String]): (String, Long) = {
      def score(path: Seq[String]): Long =
        path.indices.map { i =>
          val t1 = if (i >= 2) path(i - 2) else "^"
          val t2 = if (i >= 1) path(i - 1) else "^"
          trans.getOrElse((t1, t2, path(i)), 0L) + emit.getOrElse((ws(i), path(i)), 0L)
        }.sum
      val all = ws.foldLeft(Seq(Seq.empty[String])) { (acc, _) =>
        acc.flatMap(p => tags.map(p :+ _))
      }
      val best = all.map(p => (p.mkString(" "), score(p)))
        .minBy { case (p, s) => (-s, p) }
      best
    }

    val dec = PosTag.decode(docs, "doc_id", "text", emitDf, transDf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(3), r.getLong(4))).toMap
    val sentences = words.collect()
      .map(r => ((r.getLong(0), r.getLong(2)), (r.getInt(3), r.getString(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).map(_._2).toSeq).toMap
    assert(sentences.nonEmpty && sentences.keySet === dec.keySet)
    sentences.foreach { case (key, ws) =>
      assert(dec(key) === brute(ws), s"DP diverged from brute force at $key ($ws)")
    }
  }
}
