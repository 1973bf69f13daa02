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
    val ranks = Graph.pageRank(Graph.undirected(edges), iters = 3)
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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q47_pagerank", pageRankQuery, Some(pageRankSql)))
}
