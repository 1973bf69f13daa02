package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Helpers that keep query results bit-identical between Spark and the
  * DuckDB oracle.
  *
  * Floating-point `sum()` is order-dependent, and Spark's partial
  * aggregation order differs from DuckDB's sequential scan — so every
  * money/measure aggregate goes through exact decimal arithmetic
  * (associative, order-free) and is cast to double only at the very end.
  * Two engines casting the *same* exact decimal to double produce the
  * same IEEE value.
  */
package object queries {

  private val Dec = DecimalType(18, 4)

  /** The decimal→double cast itself is an engine hazard: above ~2^32 the
    * double ulp exceeds 1e-7 and the two engines may round the same exact
    * decimal to ADJACENT doubles (observed at sf0.1: …767.0194 vs
    * …767.0193996). A final round to 4 decimals collapses adjacent
    * doubles to one value; the underlying sum is still exact decimal
    * arithmetic. */

  /** Exact decimal sum of a double column, returned as double.
    * DuckDB twin: `round(CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE), 4)` */
  def dsum(c: Column): Column = round(sum(c.cast(Dec)).cast(DoubleType), 4)

  /** Exact decimal sum of a product of two double columns, as double.
    * DuckDB twin:
    * `round(CAST(SUM(CAST(a AS DECIMAL(18,4)) * CAST(b AS DECIMAL(18,4))) AS DOUBLE), 4)` */
  def dsumProd(a: Column, b: Column): Column =
    round(sum(a.cast(Dec) * b.cast(Dec)).cast(DoubleType), 4)

  /** Order-free average: exact decimal sum divided (in double) by count.
    * DuckDB twin:
    * `round(CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4)` */
  def davg(c: Column): Column =
    round(sum(c.cast(Dec)).cast(DoubleType) / count(lit(1)), 4)
}
