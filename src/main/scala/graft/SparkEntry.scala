package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real logic lives in graft.queries.*; this object just adapts the
  * central QueryDef registry to the driver's Map-shaped interface.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end corpus-curation composition (q38): quality gate ∩
    * exact-dedup canonicals ∩ near-dup cluster canonicals → leakage-safe
    * splits → per-(split, lang) rollup, in one declarative plan. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.ensureRuntimeConfs(spark)
    graft.queries.PrepQueries.curation(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        GraftSession.ensureRuntimeConfs(s)
        q.run(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
