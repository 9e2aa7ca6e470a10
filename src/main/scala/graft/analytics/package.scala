package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object analytics {
  /** Deterministic sum over a double column.
    *
    * Plain `sum(double)` is order-dependent (FP addition is non-associative,
    * and shuffle/partial-agg order varies run-to-run and engine-to-engine),
    * which would break the driver's hash-compare against the DuckDB oracle.
    * Summing in DECIMAL(18,4) is exact and associative; the final cast back
    * to double is a single deterministic conversion. Oracle-side equivalent:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Deterministic avg: exact decimal sum, then one double division. */
  def davg(c: Column): Column = dsum(c) / count(c)
}
