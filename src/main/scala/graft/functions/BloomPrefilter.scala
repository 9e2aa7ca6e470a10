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
    * The defaults (1 M items, 8 M bits = 1 MiB) are Spark's own
    * runtime-filter defaults (`spark.sql.optimizer.runtime.bloomFilter.
    * expectedNumItems`/`.numBits`); size up for bigger build sides —
    * every partial-aggregate partition allocates one numBits-sized
    * buffer, so the sketch cost is (partitions + tasks) × numBits/8
    * bytes regardless of data volume. False positives only add exact-
    * join work, never wrong results.
    */
  def bloomAgg(keyHash: Column,
               expectedItems: Long = 1L << 20,
               numBits: Long = 1L << 23): Column =
    GraftSql.column(new BloomFilterAggregate(GraftSql.expression(keyHash),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** One-row DataFrame holding the serialized filter over `keys` —
    * the scalar-subquery side of [[mightContain]].
    */
  def bloomOf(keys: DataFrame, keyHash: Column,
              expectedItems: Long = 1L << 20,
              numBits: Long = 1L << 23): DataFrame =
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
    * shuffling it whole is the bottleneck. `leftKey == rightKey` is
    * fine (the build side's key is renamed internally, so the join
    * condition never sees an ambiguous reference).
    */
  def bloomSemiJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    expectedItems: Long = 1L << 20,
                    numBits: Long = 1L << 23): DataFrame = {
    val rightKeys = right.select(col(rightKey).as(buildKeyName))
    val bloom = bloomOf(rightKeys, xxhash64(col(buildKeyName)), expectedItems, numBits)
    left.filter(maybeMemberOf(bloom, xxhash64(col(leftKey))))
      .join(rightKeys, col(leftKey) === col(buildKeyName), "left_semi")
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
    * the clean majority's rows never touch an exchange.
    *
    * Cost trade, explicit: the two complementary branches are TWO
    * passes over `left`'s scan (Spark does not fuse scans across union
    * branches) and `right`'s key column is read twice (sketch + exact
    * join). The prefilter wins when a probe-side SHUFFLE (~every byte
    * of every row, spilled and re-read) costs more than a second
    * columnar SCAN of the probe's (pruned) columns — true for the
    * key-plus-narrow-payload shapes this is for; for very wide probe
    * rows, prefilter a key+id projection and rejoin the payload.
    *
    * `left` must be DETERMINISTIC: the two complementary branches each
    * re-evaluate `left`'s plan, so a left side containing
    * nondeterministic expressions (rand(), sample(), a monotonically
    * increasing id) can disagree between scans on which rows pass
    * might_contain — silently dropping or duplicating rows. Persist or
    * checkpoint such a left before calling (all in-repo call sites are
    * deterministic).
    */
  def bloomAntiJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    expectedItems: Long = 1L << 20,
                    numBits: Long = 1L << 23): DataFrame = {
    val rightKeys = right.select(col(rightKey).as(buildKeyName))
    val bloom = bloomOf(rightKeys, xxhash64(col(buildKeyName)), expectedItems, numBits)
    val maybeMember = maybeMemberOf(bloom, xxhash64(col(leftKey)))
    left.filter(!maybeMember)
      .unionByName(
        left.filter(maybeMember)
          .join(rightKeys, col(leftKey) === col(buildKeyName), "left_anti"))
  }

  /** Internal rename for the build side's key, so `leftKey == rightKey`
    * never produces an ambiguous join condition.
    */
  private val buildKeyName = "__bloom_build_key"

  /** [[mightContain]] coerced for FILTER branching: an EMPTY build side
    * makes `BloomFilterAggregate` evaluate to NULL (Spark's contract),
    * and might_contain null-propagates — under a plain filter that NULL
    * would drop every probe row from BOTH complementary branches of
    * [[bloomAntiJoin]] (silently losing the whole left side) instead of
    * declaring every probe a non-member. NULL ⇒ false = "definitely not
    * a member", which is exact for an empty key set.
    */
  private def maybeMemberOf(bloomDf: DataFrame, keyHash: Column): Column =
    coalesce(mightContain(bloomDf, keyHash), lit(false))
}
