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

  /** EAGERLY convert a Column composition to its catalyst expression
    * tree (unresolved function/lambda nodes intact — the analyzer
    * resolves them to fixpoint once the tree lands in a plan). A
    * FunctionRegistry builder that returns a COMPOSED-builtins function
    * needs this: `expression`'s lazy ColumnNodeExpression wrapper is
    * only converted on the DataFrame path, so from SQL it reaches
    * codegen unresolved and fails. */
  def composedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a temp SQL function on an EXISTING session (the
    * FunctionRegistry hangs off `sessionState`, which is `private[sql]`).
    * For sessions built from scratch, prefer the public
    * `spark.sql.extensions=graft.GraftSparkExtensions` route. */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
}
