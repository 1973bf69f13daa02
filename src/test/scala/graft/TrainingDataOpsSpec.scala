package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, SimilarityQueries, TextQueries}
import graft.sources.Tables

/** Structural invariants for the round-9 training-data operators
  * (q164 boilerplate, q165 bitext mining, q166 soft dedup, q167 vocab
  * growth, q168 semantic decontamination). Exact values are the DuckDB
  * oracle's job; these pin the properties a value-compare can't express
  * (conservation, monotonicity, planted-signal recall) against future
  * refactors. */
class TrainingDataOpsSpec extends SparkSpec {

  test("q164: every page yields exactly 4 blocks; chrome never survives") {
    val rows = TextQueries.boilerplateRemoval(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val nBlocks = r.getAs[Long]("n_blocks")
      val nKept = r.getAs[Long]("n_kept")
      assert(nBlocks == 4 * nDocs,
        s"block split drifted: $nBlocks blocks for $nDocs docs in $r")
      // nav and footer are link-dense/short by construction: at most the
      // two paragraph blocks of each page can classify as content
      assert(nKept <= 2 * nDocs, s"chrome classified as content: $r")
      assert(r.getAs[Long]("chars_kept") <= r.getAs[Long]("chars_total"))
    }
    assert(rows.map(_.getAs[Long]("n_kept")).sum > 0,
      "no content block survived anywhere — classifier thresholds broken")
  }

  test("q167: Heaps census is an exact prefix structure over the corpus") {
    val rows = TextQueries.vocabGrowth(spark, sf()).collect()
      .sortBy(_.getAs[Long]("bucket"))
    val toks = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("tok"))
    val nTok = toks.count()
    val nTypes = toks.distinct().count()
    assert(rows.last.getAs[Long]("cum_tokens") == nTok,
      "cumulative tokens must end at the corpus token count")
    assert(rows.last.getAs[Long]("cum_types") == nTypes,
      "cumulative types must end at the distinct vocabulary size")
    var ct = 0L; var ck = 0L
    rows.foreach { r =>
      ct += r.getAs[Long]("new_types"); ck += r.getAs[Long]("bucket_tokens")
      assert(r.getAs[Long]("cum_types") == ct, s"cum_types drifted at $r")
      assert(r.getAs[Long]("cum_tokens") == ck, s"cum_tokens drifted at $r")
    }
  }

  test("q166: soft-dedup weights conserve mass and find the planted dups") {
    val census = DedupQueries.softDedupWeights(spark, sf()).collect()
    census.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val eff = r.getAs[Long]("effective_docs_micro")
      assert(eff <= n * 1000000L, s"effective size above raw size: $r")
      assert(eff > 0)
      assert(r.getAs[Long]("dup_mass_micro") == n * 1000000L - eff)
    }
    assert(census.map(_.getAs[Long]("n_downweighted")).sum > 0,
      "planted near-dups exist, so some docs must be down-weighted")
  }

  test("q168: planted eval copies are flagged as contaminated") {
    val rows = SimilarityQueries.semanticDecontam(spark, sf()).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_train"))
    }
    val nEval = Tables.embeddings(spark, sf())
      .filter(col("vec_id") % 97 === 0 && col("vec_id") < 100000).count()
    assert(nEval > 0, "fixture must contain eval vectors")
    assert(rows.map(_.getAs[Long]("n_flagged")).sum >= nEval,
      "every planted exact copy must clear the 0.9 flag threshold")
    assert(rows.map(_.getAs[Long]("worst_contam_micro")).max >= 999000L,
      "an exact copy must score ~1.0")
  }

  test("q169: temperature sampling flattens the language distribution") {
    val rows = graft.queries.PrepQueries.temperatureSampling(spark, sf()).collect()
    assert(rows.length >= 2)
    val sumBase = rows.map(_.getAs[Long]("base_share_micro")).sum
    val sumTemp = rows.map(_.getAs[Long]("temp_share_micro")).sum
    // floor rounding loses < 1µ per language
    assert(sumBase > 1000000L - rows.length && sumBase <= 1000000L)
    assert(sumTemp > 1000000L - rows.length && sumTemp <= 1000000L)
    // α = 0.5 flattening: the largest language is down-sampled, the
    // smallest up-sampled
    val byTokens = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(byTokens.last.getAs[Long]("multiplier_milli") < 1000L,
      s"head language must down-sample: ${byTokens.last}")
    assert(byTokens.head.getAs[Long]("multiplier_milli") > 1000L,
      s"tail language must up-sample: ${byTokens.head}")
  }

  test("q170: agreement cells partition the corpus exactly") {
    val rows = graft.queries.TextQueries.filterAgreement(spark, sf()).collect()
    assert(rows.length <= 8)
    val nDocs = Tables.documents(spark, sf()).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every document lands in exactly one agreement cell")
    val shares = rows.map(_.getAs[Long]("share_micro")).sum
    assert(shares > 1000000L - rows.length && shares <= 1000000L)
  }

  test("q171: planted encoding damage is counted exactly") {
    val rows = graft.queries.TextQueries.encodingQc(spark, sf()).collect()
    val docs = Tables.documents(spark, sf())
    val expFlagged = docs.filter(col("doc_id") % 13 === 0).count()
    val expRepl = docs.filter(col("doc_id") % 26 === 0).count()
    assert(rows.map(_.getAs[Long]("n_flagged")).sum == expFlagged,
      "every 13th doc carries a planted BEL and nothing else is damaged")
    assert(rows.map(_.getAs[Long]("total_control_chars")).sum == expFlagged)
    assert(rows.map(_.getAs[Long]("total_replacement_chars")).sum == expRepl)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("q172: robots verdicts partition pages; rules bind per site class") {
    val rows = graft.queries.ParticipantQueries.robotsCompliance(spark, sf())
      .collect()
    assert(rows.length == 37)
    rows.foreach { r =>
      // registrable domain of crawl.siteN.com = siteN.com (last 2 labels)
      val site = r.getAs[String]("domain")
        .stripPrefix("site").stripSuffix(".com").toInt
      val (all, pre, ok) = (r.getAs[Long]("n_blocked_all"),
        r.getAs[Long]("n_blocked_prefix"), r.getAs[Long]("n_allowed"))
      assert(all + pre + ok == r.getAs[Long]("n_pages"), s"verdicts must partition: $r")
      if (site % 11 == 0)
        assert(ok == 0 && pre == 0 && all == r.getAs[Long]("n_pages"),
          s"block-all domain leaked fetches: $r")
      else assert(all == 0, s"non-blocked domain reported blocked_all: $r")
      if (site % 3 != 0 || site % 11 == 0)
        assert(pre == 0, s"prefix rule fired off its site class: $r")
      assert(r.getAs[Long]("crawl_delay_s") == (if (site % 5 == 0) 10L else 0L))
    }
  }

  test("q173: novelty census conserves occurrences; decile 0 replays nothing") {
    val rows = graft.queries.TextQueries.ngramNovelty(spark, sf()).collect()
      .sortBy(_.getAs[Long]("bucket"))
    val docs = Tables.documents(spark, sf())
    val expOcc = docs.select(
        (greatest(size(split(col("text"), " ")) - 2, lit(0))).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_grams")).sum == expOcc,
      "every trigram occurrence lands in exactly one decile")
    assert(rows.head.getAs[Long]("n_repeat_past") == 0L,
      "the first decile has no past to replay")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_repeat_past") <= r.getAs[Long]("n_grams"))
      assert(r.getAs[Long]("new_types") <= r.getAs[Long]("n_grams"))
    }
  }

  test("q174: packing never pads more than naive batching; accounting balances") {
    val rows = graft.queries.PrepQueries.paddingWaste(spark, sf()).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val l = r.getAs[Long]("l")
      val tot = r.getAs[Long]("total_tokens")
      assert(r.getAs[Long]("naive_seqs") * l ==
        tot + r.getAs[Long]("naive_pad_tokens"))
      assert(r.getAs[Long]("packed_seqs") * l ==
        tot + r.getAs[Long]("packed_pad_tokens"))
      assert(r.getAs[Long]("packed_pad_tokens") <= r.getAs[Long]("naive_pad_tokens"),
        s"packing can only reduce padding: $r")
      assert(r.getAs[Long]("packed_seqs") <= r.getAs[Long]("naive_seqs"))
    }
    // at L far above the median doc length, packing must help a lot
    val big = rows.maxBy(_.getAs[Long]("l"))
    assert(big.getAs[Long]("pad_saved_micro") > 500000L,
      s"at L=2048 most padding should vanish: $big")
  }

  test("q175: recall is monotone in nprobe and exact at full probe breadth") {
    val rows = graft.queries.SimilarityQueries.ivfTuning(spark, sf()).collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L, 8L))
    val recalls = rows.map(_.getAs[Long]("recall_micro"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not drop as probe breadth grows: ${recalls.toSeq}")
    assert(recalls.last == 1000000L,
      "probing all 8 cells IS the exact scan — recall must be 1.0")
    val costs = rows.map(_.getAs[Long]("candidates_scanned"))
    assert(costs.zip(costs.tail).forall { case (a, b) => a < b },
      s"candidate volume must grow with probe breadth: ${costs.toSeq}")
  }

  test("q177: the production scrub catches every plant and leaves no residue") {
    val rows = graft.queries.PrepQueries.piiEval(spark, sf()).collect()
    assert(rows.map(_.getAs[String]("pii_type")).sorted.toSeq ==
      Seq("email", "ip", "phone"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_planted") > 0, s"fixture must plant every type: $r")
      assert(r.getAs[Long]("recall_micro") == 1000000L,
        s"a planted PII instance escaped detection: $r")
      assert(r.getAs[Long]("n_docs_fp") == 0L,
        s"detection fired on clean text: $r")
      assert(r.getAs[Long]("n_residual_after_scrub") == 0L,
        s"the scrubbed corpus still detects PII — the release gate is void: $r")
    }
  }

  test("q178: keep-best only ever gains quality; ties collapse to keep-first") {
    val r = graft.queries.DedupQueries.canonicalChoice(spark, sf()).head()
    val (n, d, g) = (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_differ"),
      r.getAs[Long]("quality_gain_micro"))
    assert(n > 0, "planted near-dups guarantee clusters exist")
    assert(d <= n)
    // the argMaxBy tie-break prefers the lower id — a quality TIE can
    // never produce a disagreement, so every disagreement gains ≥ 1µ
    assert(g >= d, s"disagreements without quality gain: n=$n d=$d g=$g")
    assert(r.getAs[Long]("differ_share_micro") == d * 1000000L / n)
  }

  test("q165: one best match per probe, margins above neighborhood average") {
    val rows = SimilarityQueries.bitextMining(spark, sf()).collect()
    assert(rows.nonEmpty)
    val probes = rows.map(_.getAs[Long]("probe_id"))
    assert(probes.distinct.length == probes.length,
      "a probe may emit at most one mined pair")
    rows.foreach { r =>
      assert(r.getAs[Long]("margin_micro") >= 1000000L,
        s"below-neighborhood match leaked through the margin gate: $r")
      assert(r.getAs[String]("probe_lang") != "en")
      val q = r.getAs[Long]("qcos_shift_micro")
      assert(q >= 0L && q <= 2000000L, s"shift-quantized cosine out of range: $r")
    }
  }
}
