package graft

import graft.ops.AsOfJoin

/** As-of join semantics: nearest prior-or-equal right row per key;
  * left rows with no prior right row keep a null payload. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("carries the most recent right row at or before each left ts") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, 90L, "c1"), (1L, 150L, "c2"), (1L, 200L, "c3"), (2L, 60L, "c4"))
      .toDF("user_id", "ts", "click")

    val out = AsOfJoin.asOfExpanded(left, right, "user_id", "ts", Seq("click"))
      .select($"tag", $"asof_click").as[(String, String)].collect().toMap

    assert(out("p1") == "c1")      // 90 <= 100, latest prior
    assert(out("p2") == "c3")      // equal ts is visible
    assert(out("p3") == null)      // 60 > 50: nothing at or before
  }
}
