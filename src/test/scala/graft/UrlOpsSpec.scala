package graft

import org.apache.spark.sql.functions._

import graft.ops.UrlOps

/** UrlOps = the URL canonicalization/domain kernel behind q157. The
  * convention is hash-pinned against DuckDB by the q157 oracle; this spec
  * pins the EDGE cases the fixture's four variants don't reach — garbage
  * input, non-default ports, https, dot-free hosts, nested www, empty
  * query survivors — plus the cap's determinism and top-k plan shape. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).as[String].head()

  private def domain(host: String): String =
    Seq(host).toDF("h").select(UrlOps.registrableDomain(col("h"))).as[String].head()

  test("canonicalization merges the equivalent surface forms") {
    val expected = "http://crawl.site3.com/page/9?a=1&b=2"
    assert(canon("HTTP://WWW.Crawl.Site3.COM:80/page/9/?b=2&a=1") == expected)
    assert(canon("http://crawl.site3.com/page/9?a=1&b=2#frag") == expected)
    assert(canon("http://www.crawl.site3.com/page/9?utm_source=f&utm_campaign=x&b=2&a=1") == expected)
    assert(canon("http://crawl.site3.com:80/page/9/?b=2&a=1") == expected)
  }

  test("canonicalization preserves the distinctions that matter") {
    // non-default port survives; https default port strips; scheme is part
    // of identity (http vs https never merge)
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("https://a.com:80/x") == "https://a.com:80/x")
    assert(canon("http://a.com/x") != canon("https://a.com/x"))
    // path identity: root vs empty merge, trailing slashes strip fully
    assert(canon("http://a.com") == "http://a.com/")
    assert(canon("http://a.com/") == "http://a.com/")
    assert(canon("http://a.com///") == "http://a.com/")
    assert(canon("http://a.com/x//") == "http://a.com/x")
    // leading www. labels strip (ALL of them — idempotence), but only
    // when they are the label prefix
    assert(canon("http://www.www.a.com/x") == "http://a.com/x")
    assert(canon("http://notwww.a.com/x") == "http://notwww.a.com/x")
    // params: all-utm query drops the '?' entirely; empty params vanish
    assert(canon("http://a.com/x?utm_source=f") == "http://a.com/x")
    assert(canon("http://a.com/x?&&a=1&") == "http://a.com/x?a=1")
    // scheme-less garbage still gets a deterministic identity
    assert(canon("Not A URL") == "not a url")
  }

  test("canonicalization is IDEMPOTENT: every canonical form is a fixed point") {
    // an identity key that is not a projection re-merges differently when
    // a canonical form is fed back (a frontier index does exactly that)
    val inputs = Seq(
      "HTTP://WWW.Crawl.Site3.COM:80/page/9/?b=2&a=1",
      "http://www.www.a.com/x//", "http://a.com///?utm_source=f",
      "https://a.com:443/x/?&&b=2&a=1#frag", "http://a.com:8080/x",
      "Not A URL", "http://", "ftp://Weird.Host:21/p/",
      "http://www./x", "https://b.org/?utm_a=1&utm_b=2",
      "http://a.com/x?a=1&a=1&b=", "   ", "?only=query", "//proto-relative")
    val df = inputs.toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c1"))
      .select(col("c1"), UrlOps.canonicalizeUrl(col("c1")).as("c2"))
    val bad = df.filter(col("c1") =!= col("c2")).collect()
    assert(bad.isEmpty, s"non-fixed-points: ${bad.mkString(", ")}")
  }

  test("registrable domain is the last two labels, host when dot-free") {
    assert(domain("crawl.site3.com") == "site3.com")
    assert(domain("a.b.c.d.example.org") == "example.org")
    assert(domain("example.org") == "example.org")
    assert(domain("localhost") == "localhost")
  }

  test("capPerDomain keeps exactly cap rows best-first, deterministically") {
    val df = Seq(
      ("d1", "u1", 10L), ("d1", "u2", 30L), ("d1", "u3", 20L),
      ("d1", "u4", 30L), // tie with u2 — canon asc breaks it
      ("d2", "u5", 5L)).toDF("domain", "canon", "best_chars")
    val kept = UrlOps.capPerDomain(df, "domain",
        Seq(col("best_chars").desc, col("canon").asc), cap = 2)
      .select("canon").as[String].collect().sorted.toSeq
    assert(kept == Seq("u2", "u4", "u5"))
  }

  test("capPerDomain plans as a group-limited window (top-k pushdown)") {
    // needs maxRows > cap: InferWindowGroupLimit skips a limit it can
    // prove useless from the child's known row bound
    val df = spark.range(100).selectExpr(
      "concat('d', id % 3) AS domain", "concat('u', id) AS canon", "id AS best_chars")
    val plan = UrlOps.capPerDomain(df, "domain",
        Seq(col("best_chars").desc, col("canon").asc), cap = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("withRegistrableDomain: suffix table fixes *.co.uk grouping, longest match wins, default untouched") {
    import spark.implicits._
    val hosts = Seq(
      "shop.co.uk",            // 2-label suffix -> 3-label registrable
      "deep.shop.co.uk",       // still groups under shop.co.uk
      "me.blogspot.co.uk",     // 3-label suffix beats its 2-label tail
      "a.me.blogspot.co.uk",   // groups under me.blogspot.co.uk
      "www-less.example.com",  // implicit 1-label suffix -> default rule
      "co.uk",                 // bare suffix stays itself
      "blogspot.co.uk",        // bare 3-label suffix stays itself
      "localhost"              // dotless
    ).toDF("host")
    val suffixes = Seq("co.uk", "blogspot.co.uk", "com").toDF("suffix")
    val out = UrlOps.withRegistrableDomain(
        UrlOps.withRegistrableDomain(hosts, "host", "dflt", None),
        "host", "psl", Some(suffixes))
      .select("host", "dflt", "psl").as[(String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("shop.co.uk") == (("co.uk", "shop.co.uk")))
    assert(out("deep.shop.co.uk") == (("co.uk", "shop.co.uk")))
    assert(out("me.blogspot.co.uk") == (("co.uk", "me.blogspot.co.uk")))
    assert(out("a.me.blogspot.co.uk") == (("co.uk", "me.blogspot.co.uk")))
    assert(out("www-less.example.com") == (("example.com", "example.com")))
    assert(out("co.uk") == (("co.uk", "co.uk")))
    assert(out("blogspot.co.uk") == (("co.uk", "blogspot.co.uk")))
    assert(out("localhost") == (("localhost", "localhost")))
    // unsupported PSL rule shapes fail fast, never silently mis-group
    val e = intercept[IllegalArgumentException] {
      UrlOps.withRegistrableDomain(hosts, "host", "psl",
        Some(Seq("*.ck").toDF("suffix")))
    }
    assert(e.getMessage.contains("unsupported"), e.getMessage)
    // duplicate + case-variant suffix rows (trivial when concatenating
    // the PSL's ICANN and private sections) must neither fan rows out
    // through the joins nor silently fail to match
    val messy = Seq("co.uk", "CO.UK", " co.uk ", "blogspot.co.uk", "com")
      .toDF("suffix")
    val out2 = UrlOps.withRegistrableDomain(hosts, "host", "psl", Some(messy))
    assert(out2.count() == hosts.count(), "duplicate suffixes fanned rows out")
    assert(out2.filter(col("host") === "shop.co.uk")
      .select("psl").as[String].head() == "shop.co.uk")
  }

  test("withRegistrableDomain property: random hosts match a JVM-side replay over 10 seeds") {
    import spark.implicits._
    // independent replay of the longest-match ladder
    def expected(host: String, sufs: Set[String]): String = {
      val labels = host.split("\\.")
      def last(k: Int): String = labels.takeRight(k).mkString(".")
      if (labels.length > 3 && sufs.contains(last(3))) last(4)
      else if (labels.length == 3 && sufs.contains(last(3))) host
      else if (labels.length > 2 && sufs.contains(last(2))) last(3)
      else if (labels.length == 2 && sufs.contains(last(2))) host
      else if (labels.length >= 2) last(2)
      else host
    }
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val parts = Seq("a", "bb", "shop", "co", "uk", "com", "net", "x9")
      def lbl() = parts(rnd.nextInt(parts.length))
      val hosts = (1 to 60).map(_ =>
        (1 to (1 + rnd.nextInt(4))).map(_ => lbl()).mkString(".")).distinct
      val sufs = (1 to 4).map(_ =>
        (1 to (2 + rnd.nextInt(2))).map(_ => lbl()).mkString(".")).distinct
      val out = UrlOps.withRegistrableDomain(
          hosts.toDF("host"), "host", "rd", Some(sufs.toDF("suffix")))
        .select("host", "rd").as[(String, String)].collect().toMap
      val sufSet = sufs.toSet
      for (h <- hosts)
        assert(out(h) == expected(h, sufSet),
          s"seed=$seed host=$h sufs=$sufs: got ${out(h)}, want ${expected(h, sufSet)}")
    }
  }

  test("politeness schedule: slots partition hosts, depth and rounds bounds are exact") {
    val out = graft.queries.ParticipantQueries
      .politenessSchedule(spark, sf()).collect()
    assert(out.nonEmpty && out.length <= 8)
    assert(out.forall(r => (0L to 7L).contains(r.getAs[Long]("slot"))))
    // the rounds-to-drain bound is exactly max(deepest queue, ceil(urls/hosts))
    out.foreach { r =>
      val (h, u, d, m) = (r.getAs[Long]("n_hosts"), r.getAs[Long]("n_urls"),
        r.getAs[Long]("max_host_depth"), r.getAs[Long]("min_rounds"))
      assert(h >= 1 && u >= h && d >= 1)
      assert(m == math.max(d, (u + h - 1) / h), s"bound drifted: $r")
    }
    // slots partition the canonical URL set: totals add up to the
    // distinct canonical count of the synthetic frontier (2 URLs/doc
    // pair collapse to 1 canonical per page ordinal at doc_id div 2)
    val nCanon = graft.sources.Tables.documents(spark, sf()).count() / 2
    assert(out.map(_.getAs[Long]("n_urls")).sum == nCanon)
  }
}
