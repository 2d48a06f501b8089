package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic aggregation helpers for oracle parity.
  *
  * Double addition is not associative, so a parallel `sum(double)` depends
  * on partition order and cannot hash-match a single-threaded DuckDB run.
  * Casting each term to an exact decimal before summing makes the sum
  * order-independent (decimal addition is exact), and the final cast back
  * to double is a deterministic single rounding. The DuckDB oracle mirrors
  * the same shape: `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
  *
  * At 100 TB this costs one extra cast per row inside whole-stage codegen;
  * partial (map-side) aggregation still applies because decimal sum is
  * associative.
  */
object Det {
  val Dec: DecimalType = DecimalType(18, 6)

  /** Order-independent sum of a double column, surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-independent mean: exact decimal sum as double / count. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Oracle-side SQL for dsum. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"

  /** Oracle-side SQL for davg. */
  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / COUNT($expr))"
}
