package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter-prefiltered joins: reduce a big-probe/big-build join to a
  * FIXED-size sketch broadcast plus an exact join over the sketch's
  * survivors only.
  *
  * The scale problem this solves: a semi-join (or membership probe) of a
  * 100 TB stream against a key set that is too large to broadcast forces
  * a full shuffle of the probe side — every probe row pays shuffle I/O
  * even though only a tiny fraction will match. A Bloom filter built over
  * the key set is O(numBits) REGARDLESS of key-set size, travels to every
  * task as one scalar-subquery value, and filters the probe stream inside
  * whole-stage codegen BEFORE any exchange; only `might_contain`
  * survivors (true matches + the controlled false-positive fraction)
  * reach the exact join, so its shuffle carries survivors, not the
  * corpus. False positives are killed by the exact join; Bloom filters
  * have no false negatives, so results are EXACTLY the plain join's —
  * the sketch only changes the plan, never the answer.
  *
  * This is the same construction Spark's AQE runtime-filter rule
  * (`InjectRuntimeFilter`) applies to qualifying shuffle joins; exposing
  * it as an operator makes the plan shape available where the rule's
  * heuristics don't reach — column-derived keys (shingle hashes),
  * pre-aggregated probes, and the decontamination pipeline
  * ([[graft.ext.Corpus.decontaminationStatsBloom]]).
  *
  * Built from Spark's native sketch expressions (`BloomFilterAggregate`,
  * `BloomFilterMightContain` — both codegen'd, merge-able at partial-agg
  * boundaries), composed via a scalar subquery so the WHOLE construction
  * is one lazy plan: building these DataFrames launches zero jobs, and
  * the filter bits are computed distributed (partial sketch per
  * partition, one merge) when the query runs.
  */
object BloomPrefilter {

  /** Aggregate column: a serialized Bloom filter over a LONG key column
    * (hash non-long keys first — [[org.apache.spark.sql.functions.xxhash64]]).
    * `expectedItems`/`numBits` size the sketch: ~numBits/expectedItems
    * bits per key, false-positive rate ≈ 0.62^(numBits/expectedItems).
    * The defaults (4 Mi items, 32 Mi bits = 4 MiB) give ~0.4 % FP — at
    * any corpus scale the task-side payload stays 4 MiB.
    */
  def bloomAgg(keyHash: Column,
               expectedItems: Long = 4L << 20,
               numBits: Long = 1L << 25): Column =
    GraftSql.column(new BloomFilterAggregate(GraftSql.expression(keyHash),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** One-row DataFrame holding the serialized filter over `keys` —
    * the scalar-subquery side of [[mightContain]].
    */
  def bloomOf(keys: DataFrame, keyHash: Column,
              expectedItems: Long = 4L << 20,
              numBits: Long = 1L << 25): DataFrame =
    keys.agg(bloomAgg(keyHash, expectedItems, numBits).as("bloom_bits"))

  /** Predicate: may `keyHash` be in the filter `bloomDf` computes?
    * `bloomDf` must be a single-row, single-binary-column aggregate (what
    * [[bloomOf]] returns); it runs as an uncorrelated scalar subquery —
    * evaluated once per query, its bits shipped to tasks as one value.
    * No false negatives; false positives at the sketch's configured rate.
    */
  def mightContain(bloomDf: DataFrame, keyHash: Column): Column =
    GraftSql.column(BloomFilterMightContain(
      ScalarSubquery(GraftSql.analyzedPlan(bloomDf)),
      GraftSql.expression(keyHash)))

  /** Exact semi-join with a Bloom prefilter on the probe side: rows of
    * `left` whose `leftKey` appears in `right`'s `rightKey` — identical
    * results to `left.join(right, cond, "left_semi")`, but only Bloom
    * survivors reach the exact join's exchange. Use when `right`'s key
    * set is too large to broadcast and `left` is large enough that
    * shuffling it whole is the bottleneck.
    */
  def bloomSemiJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    expectedItems: Long = 4L << 20,
                    numBits: Long = 1L << 25): DataFrame = {
    val rightKeys = right.select(col(rightKey))
    val bloom = bloomOf(rightKeys, xxhash64(col(rightKey)), expectedItems, numBits)
    left.filter(mightContain(bloom, xxhash64(col(leftKey))))
      .join(rightKeys, col(leftKey) === col(rightKey), "left_semi")
  }

  /** Exact anti-join with a Bloom prefilter: rows of `left` whose
    * `leftKey` does NOT appear in `right`'s `rightKey` — identical
    * results to `left.join(right, cond, "left_anti")`. The sketch's
    * no-false-negative guarantee works the other way here: a probe the
    * filter REJECTS is definitely absent from `right`, so it bypasses
    * the join entirely; only `might_contain` survivors (true members +
    * false positives) need the exact anti-join to decide. This is the
    * incremental-dedup / corpus-cleaning shape — "drop the new batch's
    * rows already present in a corpus too large to broadcast" — where
    * the clean majority of a 100 TB stream never touches an exchange.
    */
  def bloomAntiJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    expectedItems: Long = 4L << 20,
                    numBits: Long = 1L << 25): DataFrame = {
    val rightKeys = right.select(col(rightKey))
    val bloom = bloomOf(rightKeys, xxhash64(col(rightKey)), expectedItems, numBits)
    val maybeMember = mightContain(bloom, xxhash64(col(leftKey)))
    left.filter(!maybeMember)
      .unionByName(
        left.filter(maybeMember)
          .join(rightKeys, col(leftKey) === col(rightKey), "left_anti"))
  }
}
