package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.queries.{PrepQueries, SimilarityQueries, TextQueries}

/** The round-10 serving/governance additions: MMR re-ranking, hubness,
  * filter-cascade ordering, policy diff, split balance, domain reweight.
  * Oracle parity is the driver's job; these pin the operator-level
  * invariants the oracle can't see (greedy optimality, mass conservation,
  * monotonicity). */
class ServingDiversitySpec extends SparkSpec {
  import spark.implicits._

  test("mmrRerank: rank 1 is the pure-relevance argmax, picks are distinct") {
    val out = SimilarityQueries.mmrRerank(spark, sf()).collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(1)).distinct.length == 4)
    // rank 1 must equal the exact top-1 of q15's scan
    val top1 = SimilarityQueries.embeddingTopK(spark, sf())
      .limit(1).collect()(0).getLong(0)
    assert(out.find(_.getLong(0) == 1L).get.getLong(1) == top1)
  }

  test("mmrRerank: a planted redundant twin of the top hit is not picked 2nd") {
    // candidates: id 1 and 2 are the SAME vector (rel ties broken to 1),
    // id 3 is orthogonal with slightly lower rel. Pure top-k would rank
    // (1, 2, 3); MMR must skip the twin: (1, 3, 2).
    val a = Array.tabulate(4)(i => if (i == 0) 1.0f else 0.0f)
    val b = Array.tabulate(4)(i => if (i == 1) 1.0f else 0.0f)
    val cand = Seq((1L, a, 1.0), (2L, a, 1.0), (3L, b, 0.9))
      .toDF("id", "vec", "rel")
    val picks = Similarity.mmrRerank(cand, "id", "vec", "rel", k = 3, lambda = 0.5)
      .orderBy($"rank").collect().map(_.getLong(1))
    assert(picks.toSeq == Seq(1L, 3L, 2L), s"got ${picks.toSeq}")
  }

  test("mmrRerank: every greedy pick maximizes the step's MMR score") {
    val cand = SimilarityQueries.embeddingTopK(spark, sf()).limit(6)
      .join(graft.sources.Tables.embeddings(spark, sf()), Seq("vec_id"))
      .select($"vec_id", $"embedding", $"cosine".as("rel"))
    val out = Similarity.mmrRerank(cand, "vec_id", "embedding", "rel",
      k = 3, lambda = 0.7).orderBy($"rank").collect()
    // replay the greedy on the driver from the same quantized cosines
    val rows = cand.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    def qcos(x: Array[Float], y: Array[Float]): Double = {
      val qa = x.map(v => math.floor(v * 1000).toLong)
      val qb = y.map(v => math.floor(v * 1000).toLong)
      val dot = qa.zip(qb).map { case (p, q) => p * q }.sum.toDouble
      dot / (math.sqrt(qa.map(v => v * v).sum.toDouble) *
        math.sqrt(qb.map(v => v * v).sum.toDouble))
    }
    var selected = List.empty[Long]
    for (step <- 1 to 3) {
      val best = rows.filterNot(r => selected.contains(r._1)).map { r =>
        val pen = if (selected.isEmpty) 0.0
          else selected.map(s => qcos(r._2, rows.find(_._1 == s).get._2)).max
        (r._1, 0.7 * r._3 - (1.0 - 0.7) * pen)
      }.minBy { case (id, s) => (-s, id) }
      assert(out(step - 1).getLong(1) == best._1,
        s"step $step: spark picked ${out(step - 1).getLong(1)}, replay says $best")
      selected = selected :+ best._1
    }
  }

  test("hubness: histogram masses and out-edge budget conserve") {
    val hist = SimilarityQueries.hubness(spark, sf()).collect()
    val sample = graft.sources.Tables.embeddings(spark, sf())
      .filter($"vec_id" < 200).count()
    assert(hist.map(_.getLong(1)).sum == sample) // every vector lands in one bin
    // every sample vector emits exactly 5 neighbour votes
    assert(hist.map(r => r.getLong(0) * r.getLong(1)).sum == 5L * sample)
  }

  test("filterOrdering: ranked cheapest-first and lower-bounded by gate 1") {
    val rows = TextQueries.filterOrdering(spark, sf()).collect()
    assert(rows.length == 6)
    val costs = rows.map(_.getLong(2))
    assert(costs.toSeq == costs.sorted.toSeq) // rank order == cost order
    val nDocs = graft.sources.Tables.documents(spark, sf()).count()
    val firstGateCost = Map("len" -> 1L, "lang" -> 4L, "quality" -> 9L)
    rows.foreach { r =>
      val first = r.getString(1).split(">")(0)
      assert(r.getLong(2) >= nDocs * firstGateCost(first))
    }
  }

  test("policyDiff: transitions partition the corpus, causes attribute flips") {
    val rows = PrepQueries.policyDiff(spark, sf()).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf()).count()
    assert(rows.map(_.getLong(3)).sum == nDocs)
    rows.foreach { r =>
      val (t, c) = (r.getString(1), r.getString(2))
      if (t == "kept_dropped") assert(c == "diversity_gate")
      else if (t == "dropped_kept") assert(c == "threshold_relaxed")
      else assert(c == "stable")
    }
  }

  test("splitBalance: cells partition the corpus and deviations are signed shares") {
    val rows = PrepQueries.splitBalance(spark, sf()).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf()).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(3) - r.getLong(4)) // dev = split - global
    }
  }

  test("vocabSweep: fertility is non-increasing in merges, word mass constant") {
    val rows = TextQueries.vocabSweep(spark, sf()).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 6L, 10L))
    assert(rows.map(_.getLong(1)).distinct.length == 1) // n_words fixed
    val fert = rows.map(_.getLong(3))
    assert(fert.zip(fert.tail).forall { case (a, b) => b <= a },
      s"fertility must fall (or hold) with each added merge: ${fert.toSeq}")
    // the 10-merge sweep point must equal q83's corpus totals
    val q83 = TextQueries.bpeEncode(spark, sf())
      .agg(sum(col("n_words")), sum(col("n_subwords"))).collect()(0)
    assert(rows.last.getLong(1) == q83.getLong(0))
    assert(rows.last.getLong(2) == q83.getLong(1))
  }

  test("embeddingDrift: snapshots partition the corpus, cosine bounded") {
    val rows = SimilarityQueries.embeddingDrift(spark, sf()).collect()
    val n = graft.sources.Tables.embeddings(spark, sf()).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == n)
    rows.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
  }

  test("lshTuning: looser bandings never lose recall, detected bounded") {
    val rows = graft.queries.DedupQueries.lshTuning(spark, sf())
      .orderBy(col("rows_per_band").desc).collect() // strict -> loose
    assert(rows.length == 3)
    assert(rows.map(_.getLong(2)).distinct.length == 1) // one shared truth
    val (cands, det) = (rows.map(_.getLong(3)), rows.map(_.getLong(4)))
    assert(cands.zip(cands.tail).forall { case (a, b) => b >= a },
      s"candidates must grow as rows-per-band shrinks: ${cands.toSeq}")
    assert(det.zip(det.tail).forall { case (a, b) => b >= a },
      s"recall must not fall as banding loosens: ${det.toSeq}")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3) && r.getLong(4) <= r.getLong(2))
    }
  }

  test("clusterSplit: by_cluster is leak-free by construction, by_doc is not") {
    val rows = graft.queries.DedupQueries.clusterSplit(spark, sf()).collect()
    assert(rows.length == 6)
    val byMode = rows.groupBy(_.getString(0))
    assert(byMode("by_cluster").forall(_.getLong(4) == 0L),
      "cluster-keyed split must have zero groups straddling splits")
    // doc counts conserve across modes (same corpus, different keying)
    assert(byMode("by_cluster").map(_.getLong(2)).sum ==
      byMode("by_doc").map(_.getLong(2)).sum)
  }

  test("tokenBudget: water-filling meets the budget to floor slack, caps bind") {
    val rows = PrepQueries.tokenBudget(spark, sf()).collect()
    val budget = 2L * rows.map(_.getLong(1)).sum
    val alloc = rows.map(_.getLong(4)).sum
    assert(alloc <= budget && alloc >= budget - rows.length,
      s"allocation $alloc vs budget $budget (slack must be < |sources|)")
    // clipped sources sit exactly at their cap; unclipped share one λ
    rows.foreach { r =>
      if (r.getBoolean(5)) assert(r.getLong(3) == r.getLong(2) * 1000000L)
    }
    val lams = rows.filterNot(_.getBoolean(5)).map(_.getLong(3)).distinct
    assert(lams.length <= 1, s"unclipped sources must share one epoch level: ${lams.toSeq}")
    // a higher cap never receives fewer epochs
    val byCap = rows.groupBy(_.getLong(2)).view.mapValues(_.map(_.getLong(3)).max)
    byCap.toSeq.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(b >= a); case _ =>
    }
  }

  test("sourceContainment: the planted mirror is fully contained in the originals") {
    val rows = PrepQueries.sourceContainment(spark, sf()).collect()
    val mirrorOut = rows.filter(_.getString(0) == "mirror")
    assert(mirrorOut.nonEmpty, "the planted mirror must overlap its originals")
    // every mirror text came from exactly one original source
    assert(mirrorOut.map(_.getLong(3)).sum == mirrorOut.head.getLong(2),
      "mirror shared counts must sum to the mirror's distinct-text size")
    // overlap is symmetric in n_shared
    val key = rows.map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    key.foreach { case ((a, b), n) => assert(key((b, a)) == n) }
  }

  test("curriculumOrder: stages partition the corpus in disjoint difficulty ranges") {
    val rows = PrepQueries.curriculumOrder(spark, sf()).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val n = graft.sources.Tables.documents(spark, sf()).count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) <= b.getLong(2), // hi(k) <= lo(k+1): disjoint stages
          s"stage ${a.getInt(0)} hi=${a.getLong(3)} overlaps stage ${b.getInt(0)} lo=${b.getLong(2)}")
      case _ =>
    }
  }

  test("domainReweight: tilt is monotone in loss at fixed mass, shares normalize") {
    val rows = TextQueries.domainReweight(spark, sf()).collect()
    // floors lose < 1 micro per source
    val sumBase = rows.map(_.getLong(2)).sum
    val sumRw = rows.map(_.getLong(4)).sum
    assert(sumBase > 1000000L - rows.length && sumBase <= 1000000L)
    assert(sumRw > 1000000L - rows.length && sumRw <= 1000000L)
    // the reweighting direction: deltas sum to ~0 and the max-boosted
    // source must carry an above-average loss
    val avgLoss = rows.map(_.getLong(3)).sum / rows.length
    val boosted = rows.maxBy(_.getLong(5))
    assert(boosted.getLong(3) >= avgLoss,
      s"max-boosted source has below-average loss ${boosted.getLong(3)} < $avgLoss")
  }
}
