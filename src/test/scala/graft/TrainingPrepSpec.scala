package graft

import org.apache.spark.sql.functions._
import graft.ops.TrainingPrep

/** Unit coverage for the training-data preparation operators (the oracle
  * gate covers them end-to-end at sf0.01; these pin the semantics on
  * hand-built fixtures). */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags exactly the train docs sharing an n-gram") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (200L, "one two three four")).toDF("doc_id", "text")
    val train = Seq(
      // contains bench 100's "beta gamma delta epsilon" 4-gram
      (1L, "xx beta gamma delta epsilon yy"),
      // word overlap but never 4 consecutive shared words
      (2L, "alpha beta xx gamma delta yy epsilon zeta"),
      // contains bench 200's full text as a sub-sequence
      (3L, "zz one two three four"),
      (4L, "nothing in common here at all")).toDF("doc_id", "text")
    val got = TrainingPrep.decontaminate(train, bench, "doc_id", "text", n = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 100L), (3L, 1L, 200L)))
  }

  test("decontamination matches whole-text fallback for sub-n docs") {
    // docs shorter than n shingle to their whole text on BOTH sides
    val bench = Seq((9L, "tiny doc")).toDF("doc_id", "text")
    val train = Seq((1L, "tiny doc"), (2L, "tiny")).toDF("doc_id", "text")
    val got = TrainingPrep.decontaminate(train, bench, "doc_id", "text", n = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 9L)))
  }

  test("bloom decontamination: superset of exact, inserted members always hit") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (200L, "one two three four")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "xx beta gamma delta epsilon yy"),
      (2L, "alpha beta xx gamma delta yy epsilon zeta"),
      (3L, "zz one two three four"),
      (4L, "nothing in common here at all"),
      // the bench doc itself in train: every shingle is an inserted
      // member — Bloom guarantees ALL of them hit (no false negatives)
      (5L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val bloom = TrainingPrep.bloomDecontaminate(train, bench, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    val exact = TrainingPrep.decontaminate(train, bench, "doc_id", "text", n = 4)
      .select(col("id"), col("n_shared_shingles")).as[(Long, Long)].collect().toMap
    exact.foreach { case (id, n) =>
      assert(bloom.getOrElse(id, 0L) >= n,
        s"no-false-negative violated for doc $id: bloom=${bloom.get(id)} exact=$n")
    }
    assert(bloom(5L) == 3L, s"all 3 shingles of the verbatim bench doc must hit: $bloom")
    assert(bloom(1L) >= 1L && bloom(3L) >= 1L)
  }

  test("bloom decontamination: tiny filter saturates into false positives, deterministically") {
    // 64 bits for 400 inserted shingles (1200 probe bits): every bit ends
    // up set, so ANY probe hits — full saturation, deterministically
    val bench = (0 until 200).map(i =>
      (1000L + i, s"w${i}a w${i}b w${i}c w${i}d w${i}e")).toDF("doc_id", "text")
    val train = Seq((1L, "totally unrelated words right here")).toDF("doc_id", "text")
    def run() = TrainingPrep.bloomDecontaminate(train, bench, "doc_id", "text",
      n = 4, mBits = 64, k = 3).as[(Long, Long)].collect().toSet
    val a = run()
    assert(a == run(), "false positives must be deterministic")
    assert(a.exists(_._1 == 1L),
      s"a saturated 64-bit filter must false-positive the unrelated doc: $a")
    // and the real filter size does not
    val clean = TrainingPrep.bloomDecontaminate(train, bench, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect()
    assert(clean.isEmpty, s"2^15-bit filter should not flag it: ${clean.toSeq}")
  }

  test("bloom decontamination plan: no join — probe is a literal-array bit test") {
    val bench = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq((1L, "a b c d x")).toDF("doc_id", "text")
    val plan = TrainingPrep.bloomDecontaminate(train, bench, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe side must not join:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"only the per-doc rollup may shuffle, got $shuffles:\n$plan")
  }

  test("mixture sampling: nested thresholds, default fraction, determinism") {
    val df = (0 until 400).map(i => (i.toLong, if (i % 2 == 0) "a" else "zz"))
      .toDF("doc_id", "source")
    val half = TrainingPrep.mixtureSample(df, "doc_id", "source", Map("a" -> 0.5))
    val quarter = TrainingPrep.mixtureSample(df, "doc_id", "source", Map("a" -> 0.25))
    val halfIds = half.filter($"source" === "a").select("doc_id").as[Long].collect().toSet
    val quarterIds = quarter.filter($"source" === "a").select("doc_id").as[Long].collect().toSet
    // downsampling further must keep a SUBSET (thresholds nest)
    assert(quarterIds.subsetOf(halfIds))
    assert(halfIds.size > 50 && halfIds.size < 150) // ~100 of 200 at 0.5
    // unknown source falls back to defaultFraction = 1.0 (all kept)
    assert(half.filter($"source" === "zz").count() == 200)
    // determinism: same inputs, same sample
    assert(TrainingPrep.mixtureSample(df, "doc_id", "source", Map("a" -> 0.5))
      .filter($"source" === "a").select("doc_id").as[Long].collect().toSet == halfIds)
  }

  test("repeated spans: cross-doc only, short docs zero, within-doc repeats excluded") {
    val docs = Seq(
      (1L, "a b c d e f"),        // spans: "a b c", "b c d", "c d e", "d e f"
      (2L, "x y a b c d y x"),    // shares "a b c" and "b c d" with doc 1
      (3L, "p q p q p q p q"),    // repeats WITHIN itself only — no cross-doc span
      (4L, "t u")                 // shorter than k ⇒ 0 spans
    ).toDF("doc_id", "text")
    val out = TrainingPrep.repeatedSpans(docs, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy($"id").collect()
    val byId = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L) == ((4L, 2L, 500000L)), s"doc 1: ${byId(1L)}") // 2 of 4 spans shared
    assert(byId(2L)._2 == 2L, s"doc 2 shares 2 spans: ${byId(2L)}")
    // within-doc repetition does not count (COUNT(DISTINCT doc) >= 2)
    assert(byId(3L)._2 == 0L, s"doc 3 self-repeats must not count: ${byId(3L)}")
    assert(byId(4L) == ((0L, 0L, 0L)), s"short doc: ${byId(4L)}")
  }

  test("evalOverlap: exact per-eval-doc gram fractions, clean docs emit a zero row") {
    val train = Seq(
      (1L, "xx beta gamma delta epsilon yy"),
      (2L, "one two three four five")).toDF("id", "text")
    val bench = Seq(
      // 3 distinct 4-grams, exactly 1 ("beta gamma delta epsilon") in train
      (100L, "alpha beta gamma delta epsilon zeta"),
      // verbatim leak: its single 4-gram + whole text covered → 100%
      (200L, "one two three four"),
      // fully clean: must still appear, at 0
      (300L, "nothing shared here at all")).toDF("id", "text")
    val got = TrainingPrep.evalOverlap(train, bench, "id", "text", n = 4)
      .select(col("bench_id"), col("n_grams"), col("n_overlap"), col("overlap_micro"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(100L) == ((3L, 1L, 333333L)), s"doc 100: ${got(100L)}")
    assert(got(200L) == ((1L, 1L, 1000000L)), s"doc 200: ${got(200L)}")
    assert(got(300L) == ((2L, 0L, 0L)), s"doc 300: ${got(300L)}")
    assert(got.size == 3)
  }

  test("evalOverlap: sub-n eval docs fall back to whole-text membership") {
    val train = Seq((1L, "tiny doc")).toDF("id", "text")
    val bench = Seq((9L, "tiny doc"), (10L, "tiny")).toDF("id", "text")
    val got = TrainingPrep.evalOverlap(train, bench, "id", "text", n = 4)
      .select(col("bench_id"), col("overlap_micro"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(9L -> 1000000L, 10L -> 0L))
  }

  test("evalOverlap plans a broadcast join on the eval side (train never shuffles pre-join)") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val plan = TrainingPrep.evalOverlap(
      docs.filter($"doc_id" % 97 =!= 0).select($"doc_id".as("id"), $"text"),
      docs.filter($"doc_id" % 97 === 0).select($"doc_id".as("id"), $"text"),
      "id", "text", n = 4).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("decontamination plans a broadcast join on the benchmark side") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val plan = TrainingPrep.decontaminate(
      docs.filter($"doc_id" % 97 =!= 0), docs.filter($"doc_id" % 97 === 0),
      "doc_id", "text", n = 4).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("LM quality buckets: exact floor-log2 surprisal, unseen backoff, value-tercile ties share a bucket") {
    // ref = doc 0: unigrams x:2 y:1; bigrams "x x":1 "x y":1
    val docs = Seq(
      (0L, "x x y"),   // bits: (len bin 2 - len bin 1)=1 twice → avg 1e6
      (1L, "x x x"),   // two "x x" bigrams → avg 1e6
      (2L, "x z"),     // unseen bigram → 20 bits → avg 20e6
      (3L, "q")        // <2 words: no row
    ).toDF("doc_id", "text")
    val out = graft.ops.TrainingPrep.lmQualityBuckets(
      docs, docs.filter($"doc_id" % 3 === 0), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(0L) === ((2L, 2L, 0L, 1000000L, 1)))
    assert(out(1L) === ((2L, 2L, 0L, 1000000L, 1)))
    // n=3: t1 = t2 = 1e6 (cum 2 at the first value satisfies both 3cum>=n
    // and 3cum>=2n), so both low-surprisal docs land in the HEAD bucket
    // together (equal scores may never straddle a boundary) and the
    // middle bucket is legitimately empty; the unseen-heavy doc is tail
    assert(out(2L) === ((1L, 20L, 1L, 20000000L, 3)))
  }

  test("importance selection ranks target-like raw docs first, fully tie-broken") {
    // target speaks "alpha beta"; raw doc 10 repeats it, doc 11 shares
    // one bigram, doc 12 is pure off-domain, doc 13 has no bigrams
    val target = Seq((1L, "alpha beta alpha beta alpha beta")).toDF("doc_id", "text")
    val raw = Seq(
      (10L, "alpha beta alpha beta"),
      (11L, "alpha beta zz ww"),
      (12L, "qq rr ss tt"),
      (13L, "solo")
    ).toDF("doc_id", "text")
    val out = graft.ops.TrainingPrep.importanceSelect(raw, target,
      "doc_id", "text", buckets = 4096, k = 3)
      .collect().map(r => (r.getInt(4), r.getLong(0), r.getLong(3)))
    assert(out.map(_._2).toSeq === Seq(10L, 11L, 12L),
      s"rank order wrong: ${out.toSeq}")
    // target-like doc scores strictly above the mixed one, mixed above
    // off-domain; and the no-bigram doc is absent entirely
    val byId = out.map(t => t._2 -> t._3).toMap
    assert(byId(10L) > byId(11L) && byId(11L) > byId(12L))

    // plan: weight join broadcasts, selection is TakeOrdered (no global sort)
    val plan = graft.ops.TrainingPrep.importanceSelect(raw, target,
      "doc_id", "text").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weights not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$plan")
  }

  test("token drift chi-square: hand-computed 2x2 contributions, zero on identical slices") {
    // A = 'x x x y', B = 'x y y y': classic 2x2 with chi2 = 2.0 split
    // evenly — each token contributes exactly 1e6 micro-units
    val docs = Seq(("a", "x x x y"), ("b", "x y y y"), ("c", "ignored wholly"))
      .toDF("src", "text")
    val out = graft.ops.TrainingPrep.tokenDriftChiSq(docs, "src", "text", "a", "b")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set("x", "y"), s"slice filter leaked: ${out.keySet}")
    assert(out("x") === ((3L, 1L, 1000000L)))
    assert(out("y") === ((1L, 3L, 1000000L)))
    // identical slices → d = 0 → zero drift everywhere
    val same = Seq(("a", "p q q"), ("b", "q p q")).toDF("src", "text")
    val z = graft.ops.TrainingPrep.tokenDriftChiSq(same, "src", "text", "a", "b")
      .collect().map(_.getLong(3))
    assert(z.forall(_ === 0L), s"identical slices must show zero drift: ${z.toSeq}")
  }

  test("priority sampling: matches the integer formula, weights steer inclusion, strata isolate") {
    // independent replay of the priority formula (md5-hash u, w*2^60 div (h+1))
    def prio(id: Long, w: Long): BigInt = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:prio".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = BigInt(hex, 16)
      (BigInt(w) * BigInt(2).pow(60) / (h + 1)).min(BigInt(2).pow(62))
    }
    val rows = (1L to 20L).map(id => (id, if (id <= 10) "a" else "b",
      if (id % 3 == 0) 1000L else 1L))
    val got = TrainingPrep.prioritySample(
      rows.toDF("id", "stratum", "w"), "stratum", "id", "w", k = 3)
      .select("stratum", "sample_rank", "id", "priority")
      .as[(String, Int, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (s, items) =>
      items.map(r => (s, r._1, prio(r._1, r._3)))
        .sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
        .map { case ((st, id, p), i) => (st, i + 1, id, p.toLong) }
    }.sortBy(r => (r._1, r._2))
    assert(got == expected, s"got $got\nexpected $expected")
    // strata isolate: 3 per stratum regardless of cross-stratum weights
    assert(got.count(_._1 == "a") == 3 && got.count(_._1 == "b") == 3)
    // the 1000x-weighted ids dominate each stratum's sample
    assert(got.count(r => r._3 % 3 == 0) >= 4, s"weights must steer: $got")
  }

  test("scrubPii redacts email -> ip -> phone in order; counts mirror the scrub") {
    val cases = Seq(
      // (input, scrubbed, (emails, ips, phones))
      ("mail a.b-c%d@ex-1.org now", "mail <email> now", (1, 0, 0)),
      ("host 10.2.0.45 and 192.168.1.1.", "host <ip> and <ip>.", (0, 2, 0)),
      ("call +1-555-0199 ok", "call <phone> ok", (0, 0, 1)),
      // an email's dotted digits must NOT half-match as an IP afterwards
      ("x 1.2.3.4u@a.io y", "x <email> y", (1, 0, 0)),
      // all three in one row; non-PII digit runs survive
      ("v 1234 u9@e.co 8.8.8.8 +49-30-123456 end",
        "v 1234 <email> <ip> <phone> end", (1, 1, 1)),
      ("no pii here", "no pii here", (0, 0, 0)))
    val df = cases.map(_._1).toDF("t")
      .select(TrainingPrep.scrubPii($"t").as("s"),
        TrainingPrep.piiCounts($"t").as("c"))
      .select($"s", $"c.n_emails", $"c.n_ips", $"c.n_phones")
      .as[(String, Int, Int, Int)].collect().toSeq
    assert(df == cases.map(c => (c._2, c._3._1, c._3._2, c._3._3)),
      s"got $df")
  }

  test("token shards: files are fixed-width and encode exactly the shuffle permutation") {
    import graft.ops.TokenShards
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta eps"),
      (3L, "zeta"), (4L, "eta theta iota kappa"), (5L, "lambda mu"))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    TokenShards.writeShards(docs, "doc_id", "text", out, nShards = 2, seed = "s")
    // independent JVM-side replay of the whole contract: portable hash,
    // shard deal, (h, id) order, token ids, separator, checksum
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val rows = Seq((1L, "alpha beta gamma"), (2L, "delta eps"),
      (3L, "zeta"), (4L, "eta theta iota kappa"), (5L, "lambda mu"))
    val expected = rows
      .map { case (id, text) =>
        val h = h60(s"s:$id")
        val tids = text.split(" ").map(w => h60(w) % TokenShards.Vocab) :+ TokenShards.Sep
        (h % 2, h, id, tids)
      }
      .groupBy(_._1)
      .map { case (shard, ds) =>
        val stream = ds.sortBy(d => (d._2, d._3)).flatMap(_._4)
        val checksum = stream.zipWithIndex.map { case (t, i) =>
          ((i + 1).toLong * t) % TokenShards.ChecksumMod
        }.sum % TokenShards.ChecksumMod
        shard -> ((stream.length.toLong,
          ds.length.toLong, checksum))
      }
    val census = TokenShards.shardCensus(spark, out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(census == expected, s"census $census\nexpected $expected")
    // fixed width: every file is a whole number of 4-byte tokens, sized
    // exactly to its census token count
    for ((shard, (nTok, _, _)) <- expected) {
      val f = new java.io.File(out, f"shard-$shard%04d.bin")
      assert(f.length == 4L * nTok, s"$f: ${f.length} != 4*$nTok")
    }
  }

  test("token shards property: random corpora round-trip the census over 10 seeds") {
    import graft.ops.TokenShards
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val nShards = Seq(1, 2, 4)(rnd.nextInt(3))
      val docs = (1 to (1 + rnd.nextInt(40))).map { i =>
        val words = (1 to (1 + rnd.nextInt(30)))
          .map(_ => s"w${rnd.nextInt(50)}")
        (i.toLong * 7 + rnd.nextInt(3), words.mkString(" "))
      }.distinct.groupBy(_._1).map(_._2.head).toSeq // unique ids
      val out = java.nio.file.Files.createTempDirectory(s"graft_shards_p$seed").toString
      TokenShards.writeShards(docs.toDF("doc_id", "text"), "doc_id", "text",
        out, nShards = nShards, seed = s"s$seed")
      val expected = docs
        .map { case (id, text) =>
          val h = h60(s"s$seed:$id")
          (h % nShards, h, id,
            text.split(" ").map(w => h60(w) % TokenShards.Vocab) :+ TokenShards.Sep)
        }
        .groupBy(_._1)
        .map { case (shard, ds) =>
          val stream = ds.sortBy(d => (d._2, d._3)).flatMap(_._4)
          shard -> ((stream.length.toLong, ds.length.toLong,
            stream.zipWithIndex.map { case (t, i) =>
              ((i + 1).toLong * t) % TokenShards.ChecksumMod
            }.sum % TokenShards.ChecksumMod))
        }
      val census = TokenShards.shardCensus(spark, out).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(census == expected, s"seed=$seed nShards=$nShards")
    }
  }
}
