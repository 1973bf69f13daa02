package graft

import org.apache.spark.sql.functions._
import graft.ops.Classify

/** Multinomial NB classification (q103): hand-computed weights, argmax
  * determinism under exact ties, OOV/empty-evidence domain rules. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def flog2(n: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(n)

  test("weights and scores replay the floor-log2 formula exactly") {
    // class a: "x x x y" (tc=4), class b: "y z" (tc=2); vocab {x,y,z} V=3
    val train = Seq((1L, "a", "x x x y"), (2L, "b", "y z")).toDF("id", "label", "text")
    val test = Seq((10L, "a", "x z")).toDF("id", "label", "text")
    val out = Classify.nbClassify(train, test, "label", "id", "text")
      .as[(Long, Long, String, Long, String, Int)].collect().toSeq
    def bits(cwc: Long, tc: Long): Long = 64 + flog2(cwc + 1) - flog2(tc + 3)
    // prior_bits = flog2(dc + 1) = flog2(2) = 1 for both one-doc classes
    val scoreA = 1 + bits(3, 4) + bits(0, 4) // x seen thrice in a; z unseen in a
    val scoreB = 1 + bits(0, 2) + bits(1, 2)
    assert(scoreA > scoreB, s"fixture should favor a ($scoreA vs $scoreB)")
    assert(out === Seq((10L, 2L, "a", scoreA, "a", 1)))
  }

  test("exact score tie breaks to the larger label") {
    // perfectly symmetric classes: every (word, class) count matches, so
    // scores tie exactly and the total struct order must pick the larger
    val train = Seq((1L, "a", "x y"), (2L, "b", "x y")).toDF("id", "label", "text")
    val test = Seq((10L, "a", "x"), (11L, "b", "y")).toDF("id", "label", "text")
    val out = Classify.nbClassify(train, test, "label", "id", "text")
      .orderBy(col("id"))
      .as[(Long, Long, String, Long, String, Int)].collect().toSeq
    assert(out.map(_._3) === Seq("b", "b"), s"tie must break to 'b': $out")
    assert(out.map(_._6) === Seq(0, 1))
  }

  test("OOV tokens carry no evidence; docs with no in-vocab token emit no row") {
    val train = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "label", "text")
    val test = Seq(
      (10L, "a", "x qqq zzz"), // OOV tokens must not change the score
      (11L, "b", "qqq zzz")    // nothing in vocab -> no row
    ).toDF("id", "label", "text")
    val out = Classify.nbClassify(train, test, "label", "id", "text")
      .as[(Long, Long, String, Long, String, Int)].collect().toSeq
    val clean = Classify.nbClassify(train,
      Seq((10L, "a", "x")).toDF("id", "label", "text"), "label", "id", "text")
      .as[(Long, Long, String, Long, String, Int)].collect().toSeq
    assert(out.map(_._1) === Seq(10L))
    assert(out.head._4 === clean.head._4, "OOV tokens changed the score")
    assert(out.head._2 === 1L)
  }

  test("the model grid is dense: one row per (class, vocab word)") {
    val train = Seq((1L, "a", "x x"), (2L, "b", "y z"), (3L, "b", "z"))
      .toDF("id", "label", "text")
    val grid = Classify.nbTrain(
      train.withColumn("train_doc_id", col("id")), "label", "text")
    assert(grid.count() === 2L * 3L)
    // b has dc=2 docs -> prior flog2(3) = 1; a dc=1 -> flog2(2) = 1
    val priors = grid.select($"label", $"prior_bits").distinct()
      .as[(String, Long)].collect().toMap
    assert(priors === Map("a" -> 1L, "b" -> 1L))
  }
}
