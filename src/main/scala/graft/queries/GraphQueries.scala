package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.Graph

/** Graph-analytics surface (ops.Graph). The reference's closest notion is
  * the document-relation UI graph; here link analysis is a first-class
  * distributed operator family alongside connected components (q33). */
object GraphQueries {

  /** Q47 — integer fixed-point PageRank (3 iterations, damping 0.85,
    * scale 2^40) over the bipartite order↔part purchase graph from
    * lineitem (parts = even node ids, orders = odd). Every rank is an
    * exact BIGINT, so the oracle replays all three iterations
    * bit-for-bit. Top-100 nodes by rank. */
  def pageRankQuery(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.lineitem(spark, dir)
      .select((col("l_orderkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
      .distinct()
    // symmetrize WITHOUT Graph.undirected's terminal distinct: the graph
    // is bipartite with odd→even forward edges and even→odd reversed
    // ones, so the two union sides are disjoint and each is already
    // distinct — the generic dedup was a full extra exchange of the
    // doubled edge table (guide §2.4: remove shuffles the data's own
    // structure makes redundant; value-identical by parity disjointness)
    val und = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val ranks = Graph.pageRank(und, iters = 3)
    ranks
      .select(
        when(col("node") % 2 === 1, lit("order")).otherwise(lit("part")).as("kind"),
        expr("node div 2").as("key"), col("rank"))
      .orderBy(col("rank").desc, col("kind").asc, col("key").asc)
      .limit(100)
  }

  val pageRankSql: String =
    """WITH e0 AS (
      |  SELECT DISTINCT l_orderkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM lineitem),
      |e AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
      |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
      |r0 AS (SELECT src AS node, CAST(1099511627776 AS BIGINT) AS rank FROM deg),
      |r1 AS (
      |  SELECT e.dst AS node,
      |    (1099511627776 * 15) // 100 + CAST(sum((r.rank * 85) // (100 * d.deg)) AS BIGINT) AS rank
      |  FROM e JOIN deg d USING (src) JOIN r0 r ON e.src = r.node
      |  GROUP BY e.dst),
      |r2 AS (
      |  SELECT e.dst AS node,
      |    (1099511627776 * 15) // 100 + CAST(sum((r.rank * 85) // (100 * d.deg)) AS BIGINT) AS rank
      |  FROM e JOIN deg d USING (src) JOIN r1 r ON e.src = r.node
      |  GROUP BY e.dst),
      |r3 AS (
      |  SELECT e.dst AS node,
      |    (1099511627776 * 15) // 100 + CAST(sum((r.rank * 85) // (100 * d.deg)) AS BIGINT) AS rank
      |  FROM e JOIN deg d USING (src) JOIN r2 r ON e.src = r.node
      |  GROUP BY e.dst)
      |SELECT CASE WHEN node % 2 = 1 THEN 'order' ELSE 'part' END AS kind,
      |  node // 2 AS key, rank
      |FROM r3
      |ORDER BY rank DESC, kind ASC, key ASC
      |LIMIT 100""".stripMargin

  /** The q211/q212/q215 link-graph substrate: (src, dst) page-ordinal
    * edges read off the build-once crawl link artifact
    * ([[ClusterArtifacts.htmlLinkEdges]]) — ONE WARC walk + extraction
    * per corpus, a FileScan per consumer. */
  private def htmlLinkEdges(spark: SparkSession, dir: String): DataFrame =
    ClusterArtifacts.htmlLinkEdges(spark, dir)


  /** Q211 — LINK AUTHORITY over the crawl's extracted HTML link graph:
    * directed integer fixed-point PageRank (3 iterations) on the edges
    * the q210 extraction chain parses out of rendered pages — the
    * PageRank-era authority signal computed where it actually lives, and
    * the selection weight a curation pipeline uses to prefer well-linked
    * pages over orphans. Directedness is the point (being LINKED-TO
    * confers authority; linking out confers nothing), so this rides
    * [[graft.ops.Graph.pageRankDirected]] with its dangling-node
    * semantics rather than q47's undirected walk. Node ids are the page
    * ordinals embedded in the canonical URL path; the fixture's hub
    * targets must surface at the top of the ranking. The oracle
    * reconstructs the edge set from the documents-table arithmetic the
    * fixture generator used and replays all three exact-BIGINT
    * iterations (the q47 convention + directed/dangling semantics). */
  def linkAuthority(spark: SparkSession, dir: String): DataFrame =
    Graph.pageRankDirected(htmlLinkEdges(spark, dir), iters = 3)
      .orderBy(col("rank").desc, col("node").asc)
      .limit(50)

  val linkAuthoritySql: String = {
    def iter(i: Int): String =
      s"""c$i AS (
         |  SELECT e.dst, CAST(sum((r.rank * 85) // (100 * d.outdeg)) AS BIGINT) AS c
         |  FROM e JOIN deg d USING (src) JOIN r${i - 1} r ON e.src = r.node
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT nn.node,
         |    (1099511627776 * 15) // 100 + coalesce(c$i.c, 0) AS rank
         |  FROM nodes nn LEFT JOIN c$i ON c$i.dst = nn.node)""".stripMargin
    s"""WITH n AS (SELECT count(*) AS n FROM documents),
       |pages AS (SELECT doc_id AS d FROM documents WHERE doc_id % 5 = 0),
       |links AS (
       |  SELECT s.d AS src,
       |    CASE WHEN j.j = 0 THEN (s.d // 5) % 10
       |         ELSE ((s.d * 31 + j.j * 17) % n.n) END AS dst
       |  FROM pages s CROSS JOIN n CROSS JOIN range(0, 4) j(j)
       |  WHERE j.j < (s.d % 4) + 1),
       |e AS (SELECT DISTINCT src, dst FROM links),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |r0 AS (SELECT node, CAST(1099511627776 AS BIGINT) AS rank FROM nodes),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT node, rank FROM r3
       |ORDER BY rank DESC, node ASC LIMIT 50""".stripMargin
  }

  /** Q215 — HITS hubs & authorities (Kleinberg 1999) over the crawl
    * link graph: the mutual-reinforcement scores that separate link
    * HUBS (pages whose value is pointing at good content — directories,
    * link farms) from AUTHORITIES (pages good hubs point at) — a
    * distinction one PageRank number cannot make, and a crawl-curation
    * signal in its own right (down-weight hub-like boilerplate, keep
    * authorities). Two full integer-exact iterations with L∞
    * max-normalization (Graph.hits scaladoc); top-30 by (authority,
    * hub, node). The oracle replays every half-iteration including the
    * scalar max CTEs. */
  def linkHits(spark: SparkSession, dir: String): DataFrame =
    Graph.hits(htmlLinkEdges(spark, dir), iters = 2)
      .orderBy(col("authority").desc, col("hub").desc, col("node").asc)
      .limit(30)

  val linkHitsSql: String = {
    val S = 1099511627776L // 2^40
    def half(i: Int, outName: String, inName: String, outCol: String,
        joinFrom: String, joinTo: String, groupAs: String): String =
      s"""${outName}r AS (
         |  SELECT e.$groupAs AS node, CAST(sum($inName.${if (outCol == "authority") "hub" else "authority"}) AS BIGINT) AS v
         |  FROM e JOIN $inName ON e.$joinFrom = $inName.node GROUP BY e.$groupAs),
         |${outName}f AS (
         |  SELECT n2.node, coalesce(${outName}r.v, 0) AS v
         |  FROM nodes n2 LEFT JOIN ${outName}r ON ${outName}r.node = n2.node),
         |${outName}m AS (SELECT max(v) AS mx FROM ${outName}f),
         |$outName AS (
         |  SELECT node, CASE WHEN mx > 0
         |    THEN CAST(v::HUGEINT * $S // mx AS BIGINT) ELSE 0 END AS $outCol
         |  FROM ${outName}f CROSS JOIN ${outName}m)""".stripMargin
    s"""WITH n AS (SELECT count(*) AS n FROM documents),
       |pages AS (SELECT doc_id AS d FROM documents WHERE doc_id % 5 = 0),
       |links AS (
       |  SELECT s.d AS src,
       |    CASE WHEN j.j = 0 THEN (s.d // 5) % 10
       |         ELSE ((s.d * 31 + j.j * 17) % n.n) END AS dst
       |  FROM pages s CROSS JOIN n CROSS JOIN range(0, 4) j(j)
       |  WHERE j.j < (s.d % 4) + 1),
       |e AS (SELECT DISTINCT src, dst FROM links),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |h0 AS (SELECT node, CAST($S AS BIGINT) AS hub FROM nodes),
       |${half(1, "a1", "h0", "authority", "src", "", "dst")},
       |${half(1, "h1", "a1", "hub", "dst", "", "src")},
       |${half(2, "a2", "h1", "authority", "src", "", "dst")},
       |${half(2, "h2", "a2", "hub", "dst", "", "src")}
       |SELECT n3.node, h2.hub, a2.authority
       |FROM nodes n3 JOIN h2 ON h2.node = n3.node JOIN a2 ON a2.node = n3.node
       |ORDER BY a2.authority DESC, h2.hub DESC, n3.node ASC LIMIT 30""".stripMargin
  }

  /** Q216 — LINK-SPAM census (the TrustRank-era host-level features):
    * per linking host, the counts every web-spam detector starts from —
    * total distinct out-edges, INTERNAL links (same-host targets: nav
    * boilerplate and link farms push this toward 100%), SELF-loops, and
    * RECIPROCAL edges (link-exchange rings) — plus the internal share
    * in exact micro units. Host attribution comes from the actual URLs
    * (source page URI, canonicalized href), not from arithmetic, so the
    * extraction chain is exercised end-to-end; the oracle reconstructs
    * the same censuses from the fixture's generating arithmetic.
    *
    * Scale: the distinct edge set is one exchange; reciprocity is a
    * self-join of that set on the flipped key (equi-join, same
    * partitioning); the census is a 7-key hash agg. */
  def linkSpamCensus(spark: SparkSession, dir: String): DataFrame = {
    val edges = ClusterArtifacts.htmlLinks(spark, dir)
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src"), col("src_host"), col("dst"), col("dst_host"))
      .distinct()
      .localCheckpoint(true) // two consumers: census + flipped-set join
    val flipped = edges
      .select(col("dst").as("src"), col("src").as("dst"), lit(1L).as("__r"))
      .distinct()
    edges.join(flipped, Seq("src", "dst"), "left")
      .groupBy(col("src_host"))
      .agg(count(lit(1)).as("n_links"),
        sum(when(col("src_host") === col("dst_host"), 1L).otherwise(0L))
          .as("n_internal"),
        sum(when(col("src") === col("dst"), 1L).otherwise(0L)).as("n_self"),
        sum(coalesce(col("__r"), lit(0L))).as("n_reciprocal"))
      .withColumn("internal_micro", expr("n_internal * 1000000 div n_links"))
      .orderBy(col("src_host"))
  }

  val linkSpamCensusSql: String =
    """WITH n AS (SELECT count(*) AS n FROM documents),
      |pages AS (SELECT doc_id AS d FROM documents WHERE doc_id % 5 = 0),
      |links AS (
      |  SELECT s.d AS src,
      |    CASE WHEN j.j = 0 THEN (s.d // 5) % 10
      |         ELSE ((s.d * 31 + j.j * 17) % n.n) END AS dst
      |  FROM pages s CROSS JOIN n CROSS JOIN range(0, 4) j(j)
      |  WHERE j.j < (s.d % 4) + 1),
      |e AS (SELECT DISTINCT src, dst FROM links),
      |f AS (SELECT DISTINCT dst AS src, src AS dst, 1 AS r FROM e),
      |j2 AS (
      |  SELECT e.src, e.dst, coalesce(f.r, 0) AS r FROM e LEFT JOIN f USING (src, dst))
      |SELECT 's' || CAST(src % 7 AS VARCHAR) || '.example' AS src_host,
      |  CAST(count(*) AS BIGINT) AS n_links,
      |  CAST(sum(CASE WHEN src % 7 = dst % 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_internal,
      |  CAST(sum(CASE WHEN src = dst THEN 1 ELSE 0 END) AS BIGINT) AS n_self,
      |  CAST(sum(r) AS BIGINT) AS n_reciprocal,
      |  CAST(sum(CASE WHEN src % 7 = dst % 7 THEN 1 ELSE 0 END) * 1000000
      |    // count(*) AS BIGINT) AS internal_micro
      |FROM j2 GROUP BY src % 7 ORDER BY src_host""".stripMargin

  /** Q212 — AUTHORITY × QUALITY census: the measured justification for
    * authority-weighted curation — pages bucketed into exact
    * equal-frequency AUTHORITY DECILES (OrderStats.rankBucket over the
    * q211 directed-PageRank ranks: histogram-based, no corpus-sized
    * window anywhere), each decile reporting page count, mean authority,
    * and mean q17 quality (integer-exact). If high-authority deciles
    * don't show better content, authority is a crawl-prioritization
    * signal only — this table is how a curation pipeline finds out
    * before it reweights by it. Oracle replays the full PageRank chain,
    * the quality kernel, the position-based decile assignment
    * ((pos−1)·10 div n + 1 over the (rank, node) total order — exactly
    * rankBucket's settled+straddle semantics), and the aggregates. */
  def authorityQuality(spark: SparkSession, dir: String): DataFrame = {
    val ranks = Graph.pageRankDirected(htmlLinkEdges(spark, dir), iters = 3)
    val pages = Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("node"),
        round(graft.functions.TextFunctions.qualityScoreRaw(col("text")) * 1000000, 0)
          .cast("long").as("qm"))
    // inner join: every page has ≥1 out-link, so it is in the node set.
    // Eagerly materialized: withRank fans out to THREE consumers
    // (rankBucket's histogram, its settled/straddle joins, and the final
    // census join) — unmaterialized, the quality kernel + join subtree
    // was inlined into each (the round-13 finding: 41 parquet scans and
    // 137 Exchanges in one plan; 88 s of task time at sf0.1).
    val withRank = pages.join(ranks, Seq("node")).localCheckpoint(true)
    val deciled = graft.ops.OrderStats.rankBucket(
      withRank.select(col("node"), col("rank")), "rank", "node",
      parts = 10, outCol = "decile")
    withRank.join(deciled, Seq("node"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_pages"),
        expr("sum(`rank`) div count(1)").as("mean_rank"),
        expr("sum(qm) div count(1)").as("mean_qm"))
      .orderBy(col("decile"))
  }

  val authorityQualitySql: String = {
    def iter(i: Int): String =
      s"""c$i AS (
         |  SELECT e.dst, CAST(sum((r.rank * 85) // (100 * d.outdeg)) AS BIGINT) AS c
         |  FROM e JOIN deg d USING (src) JOIN r${i - 1} r ON e.src = r.node
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT nn.node,
         |    (1099511627776 * 15) // 100 + coalesce(c$i.c, 0) AS rank
         |  FROM nodes nn LEFT JOIN c$i ON c$i.dst = nn.node)""".stripMargin
    s"""WITH n AS (SELECT count(*) AS n FROM documents),
       |pages AS (SELECT doc_id AS d FROM documents WHERE doc_id % 5 = 0),
       |links AS (
       |  SELECT s.d AS src,
       |    CASE WHEN j.j = 0 THEN (s.d // 5) % 10
       |         ELSE ((s.d * 31 + j.j * 17) % n.n) END AS dst
       |  FROM pages s CROSS JOIN n CROSS JOIN range(0, 4) j(j)
       |  WHERE j.j < (s.d % 4) + 1),
       |e AS (SELECT DISTINCT src, dst FROM links),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |r0 AS (SELECT node, CAST(1099511627776 AS BIGINT) AS rank FROM nodes),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)},
       |pq AS (
       |  SELECT doc_id AS node,
       |    CAST(round((0.3 * least(1.0, nt / 50)
       |        + 0.3 * (nd / nt)
       |        + 0.2 * (1.0 - dig / nt)
       |        + 0.2 * least(1.0, ((length(text) - (nt - 1)) / nt) / 8)) * 1000000, 0) AS BIGINT) AS qm
       |  FROM (
       |    SELECT doc_id, text,
       |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
       |      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
       |      CAST(len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '^[0-9]+$$'))) AS DOUBLE) AS dig
       |    FROM documents WHERE doc_id % 5 = 0)),
       |wr AS (SELECT p.node, p.qm, r.rank FROM pq p JOIN r3 r USING (node)),
       |dd AS (
       |  SELECT node, qm, rank,
       |    (row_number() OVER (ORDER BY rank, node) - 1) * 10
       |      // (SELECT count(*) FROM wr) + 1 AS decile
       |  FROM wr)
       |SELECT decile, CAST(count(*) AS BIGINT) AS n_pages,
       |  CAST(sum(rank) // count(*) AS BIGINT) AS mean_rank,
       |  CAST(sum(qm) // count(*) AS BIGINT) AS mean_qm
       |FROM dd GROUP BY decile ORDER BY decile""".stripMargin
  }

  /** Q77 — exact triangle counting (Graph.triangles, degree-ordered
    * orientation) over the part co-purchase graph: parts sharing ≥ 2
    * orders are linked; per-node triangle participation ranks the
    * densest co-occurrence neighbourhoods (the clique/template signal).
    * The oracle recomputes the same edges and closes wedges with a plain
    * 3-way join, so orientation bookkeeping must count every triangle
    * exactly once. Top-50 nodes by participation. */
  def trianglesQuery(spark: SparkSession, dir: String): DataFrame = {
    // build-once co-purchase edge artifact (ClusterArtifacts)
    val pairs = ClusterArtifacts.copurchaseEdges(spark, dir)
    Graph.triangles(pairs)
      .orderBy(col("n_triangles").desc, col("node").asc)
      .limit(50)
  }

  val trianglesSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |edges AS (
      |  SELECT a.pk AS u, b.pk AS v
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM edges e1
      |  JOIN edges e2 ON e2.u = e1.v
      |  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
      |pernode AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
      |    SELECT a AS node FROM tri
      |    UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri)
      |  GROUP BY node)
      |SELECT node, n_triangles FROM pernode
      |ORDER BY n_triangles DESC, node ASC LIMIT 50""".stripMargin
  // the oracle's u<v 3-way join counts each triangle once (a<b<c); the
  // engine's (degree, id) orientation must agree on the same set

  /** Q96 — label-propagation communities (Graph.labelPropagation,
    * Raghavan 2007) over the q77 co-purchase graph: 3 synchronous
    * rounds of neighbor majority vote, ties to the smallest label —
    * fully deterministic, so the oracle unrolls all three rounds (the
    * q47 PageRank convention) and every node's final community plus its
    * size must match exactly. */
  def labelPropQuery(spark: SparkSession, dir: String): DataFrame = {
    // build-once co-purchase edge artifact (ClusterArtifacts): four
    // graph queries previously each re-ran the lineitem self-join
    val pairs = ClusterArtifacts.copurchaseEdges(spark, dir)
      .select(col("u").as("src"), col("v").as("dst"))
    val labels = Graph.labelPropagation(Graph.undirected(pairs), iters = 3)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("label"))
      .select(col("node"), col("label"), col("community_size"))
      .orderBy(col("node"))
  }

  val labelPropSql: String = {
    val rounds = (1 to 3).map { i =>
      s"""c$i AS (
         |  SELECT e.dst, l.label, COUNT(*) AS c
         |  FROM e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
         |l$i AS (
         |  SELECT dst AS node, label FROM (
         |    SELECT dst, label,
         |      row_number() OVER (PARTITION BY dst ORDER BY c DESC, label ASC) AS rn
         |    FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |ed AS (
       |  SELECT a.pk AS u, b.pk AS v
       |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e AS (SELECT u AS src, v AS dst FROM ed UNION SELECT v, u FROM ed),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       |$rounds,
       |sz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size FROM l3 GROUP BY 1)
       |SELECT l.node, l.label, s.community_size
       |FROM l3 l JOIN sz s USING (label) ORDER BY l.node""".stripMargin
  }

  /** Q104 — multi-source BFS landmark assignment (Graph.bfsHops) over
    * the q77 co-purchase graph: landmarks = every graph node with
    * pk % 10 = 0, exact shortest hop distance ≤ 3 plus the nearest
    * landmark (ties to the smallest). The oracle replays it with a
    * bounded recursive walk: min hops per node, then min landmark over
    * the walks achieving that minimum — which equals the engine's
    * frontier-propagated tie-break because min is associative over the
    * shortest-walk tree. */
  def bfsHopsQuery(spark: SparkSession, dir: String): DataFrame = {
    // build-once co-purchase edge artifact (ClusterArtifacts): four
    // graph queries previously each re-ran the lineitem self-join
    val pairs = ClusterArtifacts.copurchaseEdges(spark, dir)
      .select(col("u").as("src"), col("v").as("dst"))
    val e = Graph.undirected(pairs)
    val sources = e.select(col("src").as("node")).distinct()
      .filter(col("node") % 10 === 0)
    Graph.bfsHops(e, sources, maxHops = 3)
      .orderBy(col("node"))
  }

  val bfsHopsSql: String =
    """WITH RECURSIVE items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |ed AS (
      |  SELECT a.pk AS u, b.pk AS v
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT u AS src, v AS dst FROM ed UNION SELECT v, u FROM ed),
      |srcs AS (SELECT DISTINCT src AS node FROM e WHERE src % 10 = 0),
      |walk(node, hops, landmark) AS (
      |  SELECT node, 0, node FROM srcs
      |  UNION ALL
      |  SELECT e.dst, w.hops + 1, w.landmark
      |  FROM walk w JOIN e ON e.src = w.node WHERE w.hops < 3),
      |d AS (SELECT node, MIN(hops) AS hops FROM walk GROUP BY 1)
      |SELECT d.node, CAST(d.hops AS BIGINT) AS hops,
      |  CAST(MIN(w.landmark) AS BIGINT) AS landmark
      |FROM d JOIN walk w ON w.node = d.node AND w.hops = d.hops
      |GROUP BY d.node, d.hops ORDER BY d.node""".stripMargin

  /** Q115 — link prediction by the resource-allocation index
    * (Graph.linkPrediction) over the q77 co-purchase graph: which parts
    * are NOT yet co-purchased but share many low-degree co-purchase
    * neighbours — the "you may also like" / missing-edge verb, fourth in
    * the graph family after components, PageRank, and triangles. Scores
    * are Σ 1e6 div deg(z) over common neighbours (exact integers; the
    * hub truncation at center degree ≤ 30 is part of the contract), so
    * the oracle replays edges, degrees, every wedge, every score, the
    * non-edge filter and the tie-broken top-50. */
  def linkPredictionQuery(spark: SparkSession, dir: String): DataFrame = {
    // build-once co-purchase edge artifact (ClusterArtifacts)
    val pairs = ClusterArtifacts.copurchaseEdges(spark, dir)
    Graph.linkPrediction(pairs, maxCenterDeg = 30, topK = 50)
  }

  val linkPredictionSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |edges AS (
      |  SELECT a.pk AS u, b.pk AS v
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT u AS src, v AS dst FROM edges UNION SELECT v, u FROM edges),
      |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
      |ctr AS (SELECT src, deg FROM deg WHERE deg <= 30),
      |w AS (
      |  SELECT e1.dst AS a, e2.dst AS b, c.deg
      |  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
      |  JOIN ctr c ON c.src = e1.src),
      |s AS (
      |  SELECT a, b, CAST(SUM(1000000 // deg) AS BIGINT) AS ra_e6,
      |    CAST(COUNT(*) AS BIGINT) AS n_common
      |  FROM w GROUP BY 1, 2),
      |nw AS (
      |  SELECT s.a, s.b, s.n_common, s.ra_e6
      |  FROM s LEFT JOIN edges x ON x.u = s.a AND x.v = s.b
      |  WHERE x.u IS NULL)
      |SELECT a, b, n_common, ra_e6 FROM nw
      |ORDER BY ra_e6 DESC, a ASC, b ASC LIMIT 50""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q115_link_prediction", linkPredictionQuery, Some(linkPredictionSql)),
    QueryDef("q47_pagerank", pageRankQuery, Some(pageRankSql)),
    QueryDef("q211_link_authority", linkAuthority, Some(linkAuthoritySql)),
    QueryDef("q212_authority_quality", authorityQuality, Some(authorityQualitySql)),
    QueryDef("q215_link_hits", linkHits, Some(linkHitsSql)),
    QueryDef("q216_link_spam_census", linkSpamCensus, Some(linkSpamCensusSql)),
    QueryDef("q96_label_prop", labelPropQuery, Some(labelPropSql)),
    QueryDef("q104_bfs_landmarks", bfsHopsQuery, Some(bfsHopsSql)),
    QueryDef("q77_triangles", trianglesQuery, Some(trianglesSql)))
}
