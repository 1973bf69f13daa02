package graft

import graft.queries.Registry

/** Every registered query runs on sf0.001 and yields rows — the cheap
  * guard that keeps the whole surface executable; value correctness is
  * the driver's DuckDB gate (tools/check_oracle.py locally). Each query
  * additionally passes the session-lifetime cache gate: no persisted RDD
  * blocks may survive its action (catches the Graph class of persist
  * leak permanently, for every future operator). */
class QueriesSmokeSpec extends SparkSpec {

  Registry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val base = snapshotBlocks()
      val n = q.run(spark, sf()).count()
      assert(n > 0, s"${q.name} returned no rows")
      assertNoLeakedBlocks(q.name, base)
    }
  }

  test("SparkEntry contract: oracle keys are a subset of query keys, names stable") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    assert(qk.size == Registry.all.size)
  }
}
