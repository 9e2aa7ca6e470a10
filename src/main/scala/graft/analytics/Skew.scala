package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salting for hot keys. AQE's skew-join handling (left
  * on) covers sort-merge joins at runtime; explicit salting is the
  * static tool for the cases AQE cannot rewrite — broadcast-ineligible
  * skewed joins and single-hot-key aggregations where one reducer would
  * own the key.
  */
object Skew {

  /** Two-phase salted aggregation: spread each key over `salts` partial
    * groups, combine partials, then finalize per key. The hot key's
    * map-side work fans out over `salts` reducers; the final combine
    * handles `salts` rows per key.
    *
    * The salt hashes the ROW CONTENT (key + value columns), never
    * `monotonically_increasing_id`/`rand` — those are nondeterministic
    * across task retries, and a retried map task re-salting rows
    * differently than the partials already fetched double-counts or
    * drops contributions. Content-hashing is retry-stable; the tradeoff
    * (identical duplicate rows share a salt) only narrows the spread
    * when a hot key's rows are literal duplicates.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column,
                salts: Int = 16): DataFrame =
    // the salt hashes ALL source columns, not just (key, value): a hot
    // key summing a low-cardinality value (0/1 flags, constant weights)
    // would otherwise collapse to one salt and re-create the hotspot.
    // Fully-duplicate rows still share a salt — the inherent limit of
    // retry-stable content hashing.
    df.withColumn("_salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .select(key.as("k"), value.as("v"), col("_salt"))
      .groupBy(col("k"), col("_salt"))
      .agg(sum(col("v")).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("total"))

  /** Salted equi-join for a skewed LEFT side: each left row gets one of
    * `salts` deterministic salt values (retry-stable content hash over
    * all its columns — see [[saltedSum]]); the (small,
    * broadcast-ineligible) right side is replicated across all salt
    * values, so a hot key's rows land on `salts` different reducers
    * instead of one. Result is row-identical to the unsalted join
    * (SkewSpec asserts this).
    */
  /** saltCols defaults to every big-side column; pass an explicit subset
    * when the schema carries types hash expressions reject (maps) or
    * when a smaller column set already spreads a hot key's rows.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16, saltCols: Seq[String] = Nil): DataFrame = {
    val spreadCols = (if (saltCols.nonEmpty) saltCols else big.columns.toSeq).map(col)
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(spreadCols: _*), lit(salts)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
