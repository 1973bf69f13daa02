package graft

/** HLL sketch accuracy: approx_count_distinct at rsd=0.01 must land
  * within a few percent of the exact distinct count. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val rows = graft.queries.Relational.approxDistinct(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
