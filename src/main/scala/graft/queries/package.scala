package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {
  /** A named query over one scale-factor directory. */
  type Q = (SparkSession, String) => DataFrame

  /** Oracle-parity helpers: double aggregations are made bitwise-stable
    * across engines and execution orders by summing exact decimals and
    * casting the exact result back to double. A plain `sum(double)` is
    * order-dependent and would hash-mismatch the DuckDB oracle.
    */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  def decSum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact average: decimal sum / count, evaluated in double at the end. */
  def decAvg(c: Column): Column =
    (sum(dec(c)).cast("double") / count(c)).cast("double")
}
