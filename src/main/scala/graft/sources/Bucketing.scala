package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed (and sorted) table layouts — the write-time co-location
  * strategy for 100 TB joins and aggregations.
  *
  * A table bucketed by its join/group key is pre-hash-partitioned on disk:
  * every subsequent equi-join or aggregation on that key reads buckets
  * aligned pairwise and SKIPS the shuffle exchange entirely (and, with
  * `sortBy` and one file per bucket, the sort too). The decision is made
  * once at write time instead of paying a full-table shuffle per query —
  * for a fact table read by many queries this is the single biggest
  * layout lever Spark offers. The reference has no analog (Kafka
  * partitioning plays this role on the bus; bucketing is its at-rest
  * equivalent).
  *
  * Mechanics: `bucketBy` requires the table catalog (`saveAsTable`) —
  * bucket metadata lives in the catalog, not the parquet footer. Both
  * sides of a join must agree on bucket count (or be multiples, with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed by `key` into `buckets`
    * buckets, sorted within each bucket by the same key. Drops any prior
    * table AND its leftover location first — with the in-memory catalog, a
    * previous JVM's table directory survives while its catalog entry does
    * not, and `saveAsTable` refuses to reuse the location. */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sorted: Boolean = true): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val whPath = if (wh.startsWith("file:")) new java.net.URI(wh).getPath else wh
    // the catalog lower-cases table directory names
    deleteRecursively(new java.io.File(whPath, table.toLowerCase(java.util.Locale.ROOT)))
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
