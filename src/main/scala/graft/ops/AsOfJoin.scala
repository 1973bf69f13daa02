package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row with the same
  * key and timestamp ≤ the left timestamp. The reference has nothing like
  * it (SURVEY.md §2E "what the reference does NOT have"), but it is the
  * canonical event-stream enrichment operator.
  *
  * Implementation is the scalable union-and-carry form, not a custom
  * SparkPlan: tag both sides, union, one shuffle+sort per key, carry the
  * last-seen right payload forward with a running `last(ignoreNulls)`
  * window. Cost = one exchange + in-partition sort, independent of how
  * many right rows precede each left row (a sort-merge range join would
  * re-scan them). Skewed keys: AQE or pre-salting, same as any keyed sort.
  */
object AsOfJoin {

  /** `left` and `right` must share `key` and `ts` column names; `payload`
    * names columns of `right` to carry. Right rows at exactly equal `ts`
    * are visible to left rows at that `ts` (right sorts first on ties). */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    val l = left.withColumn("_side", lit(1))
    val r = right.select(col(key), col(ts), struct(payload.map(col): _*).as("_p"))
      .withColumn("_side", lit(0))
    val unioned = l.withColumn("_p",
      lit(null).cast(r.schema("_p").dataType)).unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(lCols.map(col) :+ col("_asof"): _*)
  }

  /** Convenience: expand the carried payload back to top-level columns
    * with a prefix. */
  def asOfExpanded(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val joined = asOf(left, right, key, ts, payload)
    payload.foldLeft(joined)((d, p) =>
      d.withColumn(prefix + p, col("_asof." + p)))
      .drop("_asof")
  }
}
