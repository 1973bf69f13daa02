package graft

import graft.model.Proposition
import graft.pipeline.Facts

/** Parity with reference unittests/FactsTest.kt:11-21 plus the weighted
  * generalization. */
class FactsSpec extends SparkSpec {
  import spark.implicits._

  private val props = Seq(
    Proposition("doc1", "en", 0.6, "tika"),
    Proposition("doc1", "de", 0.9, "stanford"),
    Proposition("doc1", "en", 0.7, "azure"))

  test("MaxScore picks the max-confidence proposal with score 1.0") {
    val s = Facts.MaxScore.evaluate(props)
    assert(s.proposal == "de" && s.score == 1.0)
    assert(Facts.NoScore.evaluate(props).score == 0.0)
    assert(Facts.MaxScore.evaluate(Seq.empty).score == 0.0)
  }

  test("WeightedVote lets producer weights override raw confidence") {
    // distrust stanford: en mass = 0.6+0.7 = 1.3, de mass = 0.9*0.1 = 0.09
    val s = new Facts.WeightedVote(Map("stanford" -> 0.1)).evaluate(props)
    assert(s.proposal == "en")
    assert(s.score > 0.9)
  }

  test("columnar and typed evaluation agree with the row evaluator") {
    val ds = spark.createDataset(props)
    val colr = Facts.evaluateMax(ds.toDF()).collect().head
    assert(colr.getString(1) == "de")
    val typed = Facts.evaluate(ds, Facts.MaxScore).collect().head
    assert(typed.getString(1) == "de" && typed.getDouble(2) == 1.0)
  }
}
