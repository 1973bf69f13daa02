package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the
  * replacement (`classic.ExpressionUtils`) is `private[sql]`. This shim
  * lives inside the org.apache.spark.sql package to re-export the two
  * conversions custom Expressions need. Public pattern for Spark-4
  * extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function on an EXISTING session (the
    * FunctionRegistry hangs off `sessionState`, which is `private[sql]`).
    * For sessions built from scratch, prefer the public
    * `spark.sql.extensions=graft.GraftSparkExtensions` route. */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
}
