package graft

import graft.ops.Bpe

/** BPE vocabulary induction (ops.Bpe) against hand-computed merge
  * tables. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(wordCounts: (String, Int)*) = {
    // spread word occurrences across documents; type counting must not
    // care where occurrences live
    val words = wordCounts.flatMap { case (w, n) => Seq.fill(n)(w) }
    words.grouped(7).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  test("learns the classic merge sequence (hug/pug/pun/bun/hugs)") {
    // Sennrich-style worked example: pair counts by hand are
    //   (u,g)=10+5+5=20, (p,u)=17, (u,n)=16, (h,u)=15, ...
    // and each merge reshapes the next round's counts
    val docs = docsOf("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4, "hugs" -> 5)
    val got = Bpe.train(docs, "text", nMerges = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "u", "g", "ug", 20L),
      (2, "u", "n", "un", 16L),
      (3, "h", "ug", "hug", 15L),
      (4, "p", "un", "pun", 12L),
      (5, "hug", "s", "hugs", 5L)), got.mkString(", "))
  }

  test("merge application is greedy left-to-right (aaa -> aa + a)") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", nMerges = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    // round 1: two overlapping (a,a) occurrences but only cnt matters (2);
    // applying it greedily leaves <aa><a>, so round 2 merges (aa, a)
    assert(got.toSeq == Seq(("a", "a", 2L), ("aa", "a", 1L)), got.mkString(", "))
  }

  test("encode applies the learned merges in rank order") {
    val train = docsOf("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4, "hugs" -> 5)
    val merges = Bpe.train(train, "text", nMerges = 5).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // under [ug, un, hug, pun, hugs]: hug->1, pug->2 (p+ug), pun->1,
    // bun->2 (b+un), hugs->1, xyz->3 singles; "Q9" is filtered out
    val doc = Seq((7L, "hug pug pun bun hugs Q9 xyz")).toDF("doc_id", "text")
    val got = Bpe.encode(doc, "doc_id", "text", merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((7L, 6L, 10L)), got.mkString(", "))
  }

  test("matches a naive reference implementation on seeded random corpora") {
    // the distributed trainer (type-table iterations, TakeOrdered argmax,
    // column-level replace) against a plain-Scala re-implementation of
    // the spec, across random corpora from a tiny alphabet (dense ties —
    // the lexicographic tie-break must decide constantly)
    def naive(wordFreq: Map[String, Int], n: Int): Seq[(String, String, Long)] = {
      var reps: Map[List[String], Int] =
        wordFreq.map { case (w, f) => (w.toList.map(_.toString), f) }
      val out = Seq.newBuilder[(String, String, Long)]
      var continue = true
      var i = 0
      while (i < n && continue) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, f) <- reps; p <- syms.zip(syms.tail))
          counts(p) = counts.getOrElse(p, 0L) + f
        if (counts.isEmpty) continue = false
        else {
          val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
          out += ((l, r, c))
          reps = reps.toSeq.map { case (syms, f) =>
            // greedy left-to-right non-overlapping application
            val b = List.newBuilder[String]
            var rest = syms
            while (rest.nonEmpty) rest match {
              case a :: b2 :: t if a == l && b2 == r => b += (l + r); rest = t
              case a :: t => b += a; rest = t
              case Nil =>
            }
            (b.result(), f)
          }.groupMapReduce(_._1)(_._2)(_ + _)
          i += 1
        }
      }
      out.result()
    }
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(30)((1 to (1 + rnd.nextInt(5)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val freqs = words.groupBy(identity).view.mapValues(_.size).toMap
      val docs = words.grouped(5).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq.toDF("doc_id", "text")
      val got = Bpe.train(docs, "text", nMerges = 6).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      val expected = naive(freqs, 6)
      assert(got == expected, s"seed=$seed: got $got, expected $expected")
    }
  }

  test("stops early when no pairs remain; non-alpha tokens never count") {
    val docs = Seq((1L, "ab Hello42 a-b X ab")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", nMerges = 5).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    // only the type "ab" survives the [a-z]+ filter (freq 2); after its
    // single merge the corpus has no adjacent pairs left
    assert(got.toSeq == Seq((1, "ab", 2L)), got.mkString(", "))
  }
}
