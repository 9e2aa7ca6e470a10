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

  /** A price-ish double as an exact decimal (≤ 1e8 magnitude, 4 dp). */
  def decPrice(c: Column): Column = c.cast(DecimalType(12, 4))

  /** A rate-ish double (discount/tax, |x| < 10) as an exact decimal. */
  def decRate(c: Column): Column = c.cast(DecimalType(8, 4))

  /** Mode-free 6-dp rounding for doubles that can land EXACTLY on a
    * rounding tie (e.g. cume_dist fractions like 41/640 = 0.0640625):
    * Spark's round is HALF_UP while DuckDB's is half-even, so ties
    * diverge. floor(x·1e6 + 0.5)/1e6 is pure double arithmetic —
    * bit-identical in both engines. Oracle mirror:
    * `floor(x * 1000000 + 0.5) / 1000000`.
    *
    * Domain: NON-NEGATIVE values below ~9e12 (negative ties round toward
    * +inf, not HALF_UP, and Spark's floor returns BIGINT while DuckDB's
    * returns DOUBLE — both differences are outside every current caller's
    * range: rank fractions in [0,1], day latencies).
    */
  def round6Stable(c: Column): Column =
    floor(c * 1000000.0 + 0.5) / 1000000.0

  /** Deterministic sum of price × (1 − rate).
    *
    * The whole product stays in decimal: inputs are cast to narrow decimals
    * FIRST, so every intermediate is exact in both Spark and DuckDB —
    * DECIMAL(12,4) × DECIMAL(9,4) → DECIMAL(22,8) in Spark (no scale
    * reduction) and width 21 in DuckDB (< 38, exact). Computing the product
    * in double and casting after (the old form) let Spark and DuckDB round
    * near-tie 4th decimals differently and drift the sum. Oracle mirror:
    * `CAST(round(SUM(CAST(p AS DECIMAL(12,4)) * (1 - CAST(r AS
    * DECIMAL(8,4)))), 2) AS DOUBLE)` — round(), NOT a decimal CAST,
    * which truncates in DuckDB.
    */
  def dsumDisc(price: Column, discount: Column): Column =
    sum(decPrice(price) * (lit(1) - decRate(discount)))
      .cast(DecimalType(38, 2)).cast("double")

  /** Deterministic sum of price × (1 − discount) × (1 + tax); all-decimal,
    * exact at every step (final scale 12, well inside precision 38).
    *
    * The output reduces to DECIMAL(38,2) BEFORE the double cast: Spark
    * and DuckDB disagree by 1 ulp when converting the wide scale-12
    * decimal straight to double at 1e9+ magnitudes (surfaced at sf0.1),
    * while a 2-dp money value needs ~12 significant digits and converts
    * correctly-rounded — identically — in both engines. Oracle mirror:
    * `CAST(round(SUM(...), 2) AS DOUBLE)` — DuckDB's round() is HALF_UP
    * like Spark's decimal cast; a DuckDB decimal CAST would TRUNCATE.
    */
  def dsumCharge(price: Column, discount: Column, tax: Column): Column =
    sum(decPrice(price) * (lit(1) - decRate(discount)) * (lit(1) + decRate(tax)))
      .cast(DecimalType(38, 2)).cast("double")
}
