package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout keys (ops.Layout): correctness of the interleave and
  * the data-skipping property the layout exists for. */
class LayoutSpec extends SparkSpec {

  test("zorder2 round-trips through de-interleave") {
    import spark.implicits._
    val vals = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (1023L, 511L),
      ((1L << 20) - 1, (1L << 20) - 1), (123456L, 654321L))
    val got = vals.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorder2(col("a"), col("b")).as("z"))
      .select(col("a"), col("b"),
        Layout.zorderDim(col("z"), 0).as("a2"), Layout.zorderDim(col("z"), 1).as("b2"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3),
        s"round-trip failed: $r")
    }
  }

  test("zorder2 is monotone in each dimension (range predicates map to key ranges)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val z = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorder2(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (((a, b), zv) <- z; ((a2, b2), zv2) <- z
         if a <= a2 && b <= b2)
      assert(zv <= zv2, s"monotonicity violated: ($a,$b)->$zv vs ($a2,$b2)->$zv2")
  }

  test("z-ordered files cover narrow rectangles of BOTH dimensions") {
    // two comparable-width (10-bit) dimensions — z-ordering only splits a
    // dimension's bits if it has them; lineitem's raw suppkey at small SF
    // spans single digits and would be dominated by partkey's high bits
    val li = graft.sources.Tables.lineitem(spark, sf())
      .select(pmod(col("l_partkey") * 37 + col("l_orderkey"), lit(1024)).as("a"),
        pmod(col("l_suppkey") * 211 + col("l_linenumber") * 101, lit(1024)).as("b"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.zorderBy(li, "a", "b", numFiles = 16)
      .write.mode("overwrite").parquet(dir)
    val spreads = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max(col("a")) - min(col("a"))).as("a_spread"),
        (max(col("b")) - min(col("b"))).as("b_spread"))
      .agg(avg(col("a_spread")), avg(col("b_spread")))
      .head()
    val global = li.agg(
      (max(col("a")) - min(col("a"))).cast("double"),
      (max(col("b")) - min(col("b"))).cast("double")).head()
    // each of the 16 files must cover well under the full range in BOTH
    // dims — the property min/max row-group pruning depends on. A
    // single-column sort would leave the second dim at ~full spread.
    assert(spreads.getDouble(0) < global.getDouble(0) * 0.7,
      s"dim-a per-file spread ${spreads.getDouble(0)} vs global ${global.getDouble(0)}")
    assert(spreads.getDouble(1) < global.getDouble(1) * 0.7,
      s"dim-b per-file spread ${spreads.getDouble(1)} vs global ${global.getDouble(1)}")
  }
}
