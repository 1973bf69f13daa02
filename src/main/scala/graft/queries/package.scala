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

  /** Exact decimal sum of a double column, returned as double.
    * DuckDB twin: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)` */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact decimal sum of a product of two double columns, as double.
    * DuckDB twin:
    * `CAST(SUM(CAST(a AS DECIMAL(18,4)) * CAST(b AS DECIMAL(18,4))) AS DOUBLE)` */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(Dec) * b.cast(Dec)).cast(DoubleType)

  /** Order-free average: exact decimal sum divided (in double) by count.
    * DuckDB twin: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)` */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}
