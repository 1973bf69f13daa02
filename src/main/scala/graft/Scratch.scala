package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// TEMPORARY measurement scratch — not committed.
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import graft.sources.Tables
    import graft.ops.Dedup
    val docs = Tables.documents(spark, dir)

    for (rep <- 1 to 3) {
      println(s"== rep $rep ==")
      val planted = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          expr("concat_ws(' ', slice(split(text, ' '), 2, size(split(text, ' ')) - 1))").as("text"))
      val input = docs.select(col("doc_id"), col("text")).unionByName(planted)
      time("planted input noop") {
        input.write.format("noop").mode("overwrite").save()
      }
      // replicate minhashNearDupPairs step by step
      val shingled = time("shingled ckpt") {
        Dedup.spread(input.select(col("doc_id").as("id"),
          Dedup.wordShingles(col("text"), 3).as("shingles")))
          .localCheckpoint(true)
      }
      val sigs = shingled.select(col("id"),
        graft.functions.NativeExpressions.portableMinHashSigs(col("shingles"), 32).as("sig"))
      val banded = sigs
        .withColumn("banded", Dedup.lshBands(col("sig"), 8, 4))
        .select(col("id"), explode(col("banded")).as("b"))
        .select(col("id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
      time("banded noop") { banded.write.format("noop").mode("overwrite").save() }
      def selfJoinPairs(capped: org.apache.spark.sql.DataFrame) = {
        val l = capped.select(col("band"), col("band_hash"), col("id").as("id_a"))
        val r = capped.select(col("band"), col("band_hash"), col("id").as("id_b"))
        l.join(r, Seq("band", "band_hash"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
          .dropDuplicates("id_a", "id_b")
      }
      // shape A: current — agg + broadcast anti-join
      val oversized = banded.groupBy(col("band"), col("band_hash"))
        .agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > 1000)
        .select(col("band"), col("band_hash"))
      val cappedA = banded.join(broadcast(oversized), Seq("band", "band_hash"), "left_anti")
      time("pairs A (bcast anti)") {
        selfJoinPairs(cappedA).write.format("noop").mode("overwrite").save()
      }
      // shape B: window count over one repartition, partitioning reused
      import org.apache.spark.sql.expressions.Window
      val cappedB = banded.repartition(col("band"), col("band_hash"))
        .withColumn("__bn", count(lit(1)).over(
          Window.partitionBy(col("band"), col("band_hash"))))
        .filter(col("__bn") <= 1000).drop("__bn")
      time("pairs B (window reuse)") {
        selfJoinPairs(cappedB).write.format("noop").mode("overwrite").save()
      }
      // shape C: checkpoint the capped table once
      val cappedC = time("  C ckpt") { cappedA.localCheckpoint(true) }
      time("pairs C (ckpt capped)") {
        selfJoinPairs(cappedC).write.format("noop").mode("overwrite").save()
      }
      val bucketed = cappedA
      val pairs = selfJoinPairs(bucketed)
      val verified = pairs
        .join(shingled.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
        .join(shingled.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
      time("verified noop") { verified.write.format("noop").mode("overwrite").save() }
      time("verified+sort noop") {
        verified.orderBy(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      time("full q12") {
        SparkEntry.queries("q12_minhash_neardup")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
