package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-preparation operators a training-data pipeline runs after
  * dedup/quality filtering: deterministic dataset splitting and
  * fixed-budget sequence packing.
  */
object Corpus {

  /** Deterministic train/val/test assignment by CONTENT hash: the first
    * two hex chars of md5(text) give 256 uniform buckets, compared
    * lexicographically against hex thresholds ('e6' = 230 → ~90% train,
    * 'f3' = 243 → ~5% val, rest test). Content-keyed (not id-keyed) so
    * the same document lands in the same split across re-crawls and
    * re-partitions, and duplicate texts can never straddle splits
    * (train/test contamination). A narrow map — no shuffle, no RNG
    * state; md5-hex is engine-portable so the assignment is
    * DuckDB-checkable.
    */
  def splitAssignments(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        substring(md5(col("text").cast("binary")), 1, 2).as("bucket"))
      .withColumn("split",
        when(col("bucket") < "e6", "train")
          .when(col("bucket") < "f3", "val")
          .otherwise("test"))
      .drop("bucket")

  /** Split sizes per source — the audit a pipeline runs to confirm the
    * hash split is balanced and no source is skewed into one split.
    */
  def splitCounts(spark: SparkSession, d: String): DataFrame =
    splitAssignments(spark, d)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("split"))

  /** Sequence packing: greedy first-fit of documents into packs of at
    * most `budget` whitespace tokens (the training-batch shaping step
    * that turns ragged documents into near-full fixed-size sequences).
    *
    * Scale shape: packing is per-PARTITION greedy — a mapPartitions
    * walk carrying one open pack, no shuffle beyond the initial
    * repartition, no driver involvement; 100 TB packs in parallel with
    * per-task O(1) state. Pack ids are (partition_id, local_seq) so
    * they are globally unique without coordination. Oversized single
    * documents become their own pack (truncation is a downstream
    * tokenizer concern, flagged by `overflow`).
    */
  def packDocuments(spark: SparkSession, d: String,
                    budget: Int = 2048): DataFrame = {
    // NULL text packs as 0 tokens (size() is NULL for NULL input, and
    // the tuple encoder rejects null Ints) — every doc_id must land in
    // exactly one pack, including empty/null documents
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"),
        coalesce(size(graft.ext.TextAnalysis.tokens(col("text"))), lit(0))
          .as("n_tokens"))
    import spark.implicits._
    val packed = docs.as[(Long, Int)].rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Boolean)]
        var packSeq = 0L
        var used = 0
        var members = List.empty[(Long, Int)]
        def flush(): Unit = if (members.nonEmpty) {
          val packId = pid.toLong << 32 | packSeq
          members.reverse.foreach { case (id, n) =>
            out += ((packId, id, n, used > budget))
          }
          packSeq += 1; used = 0; members = Nil
        }
        it.foreach { case (id, n) =>
          if (used > 0 && used + n > budget) flush()
          members ::= (id, n)
          used += n
          if (used > budget) flush() // oversized single doc: own pack
        }
        flush()
        out.iterator
      }
    packed.toDF("pack_id", "doc_id", "n_tokens", "overflow")
  }

  /** Pack-level audit: fill factor per pack (the packing-efficiency
    * metric a training pipeline tracks) — non-overflow packs must not
    * exceed the budget; high mean fill means little padding waste.
    */
  def packStats(spark: SparkSession, d: String, budget: Int = 2048): DataFrame =
    packDocuments(spark, d, budget)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        max(col("overflow").cast("int")).as("has_overflow"))
      .agg(count(lit(1)).as("n_packs"),
        sum(col("n_docs")).as("docs_packed"),
        round(avg(col("pack_tokens")) / budget, 4).as("mean_fill"),
        sum(col("has_overflow")).as("overflow_packs"))

  /** Benchmark decontamination: which training documents share exact
    * token n-grams with a held-out evaluation set (the overlap check a
    * training pipeline runs so eval scores aren't inflated by leaked
    * test data — the counterpart of [[splitAssignments]]'s
    * can't-straddle-splits guarantee for data that arrives already
    * split). The fixture has no separate benchmark table, so the eval
    * set is the deterministic doc_id % `evalMod` == `evalRes` slice.
    *
    * Scale shape: the probe set is the eval side's distinct shingles
    * hashed to 8-byte xxhash64 longs — ~10× smaller than the string
    * shingles and O(1)-comparable — and it BROADCASTS only when the
    * eval side is verifiably bounded: one cheap doc_id-column count
    * guards the hint, and an oversized eval set falls back to a
    * shuffled hash join keyed on the hash (documented, still never an
    * n-gram self-join of the corpus against itself). The only shuffle
    * keyed on a training-corpus-sized input is the per-doc hit
    * aggregation, which carries ONLY matched (doc, hash) pairs.
    *
    * Hashing caveat: a train shingle is counted as contaminated iff its
    * 64-bit hash is in the eval hash set, so a hash collision could
    * overcount by one. At 2^64 hash space that needs ~10^9 distinct
    * shingles per side for a ~3% chance of ONE extra count anywhere —
    * acceptable for a stats query (run a string-equality confirm pass
    * over the flagged docs if exactness ever matters).
    *
    * Output: one row per contaminated training doc — its distinct
    * shingle count, how many shingles are shared with the eval set,
    * and the contamination ratio.
    */
  def decontaminationStats(spark: SparkSession, d: String, n: Int = 5,
                           evalMod: Int = 20, evalRes: Int = 7): DataFrame =
    decontaminationStatsDf(Tables.documents(spark, d), n, evalMod, evalRes)

  /** DataFrame form (docs must have doc_id + text).
    *
    * `maxBroadcastEvalDocs` bounds the broadcast decision: if the eval
    * slice holds more documents than this, the probe set is joined via
    * a shuffled hash join instead of broadcast (the mod-slice fixture
    * eval set grows with the corpus, so an unconditional broadcast
    * would OOM the driver at production scale). The guard costs one
    * count over the eval slice's doc_id column at plan-build time.
    */
  def decontaminationStatsDf(docs: DataFrame, n: Int = 5,
                             evalMod: Int = 20, evalRes: Int = 7,
                             maxBroadcastEvalDocs: Long = 1000000L): DataFrame = {
    val isEval = col("doc_id") % evalMod === evalRes
    val shingled = Tables.fanOut(docs)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"),
        array_distinct(Dedup.shinglesOfTokens(col("toks"), n)).as("sh"))
    val evalHashes = shingled.filter(isEval)
      .select(explode(col("sh")).as("shingle"))
      .select(xxhash64(col("shingle")).as("sh_hash")).distinct()
    val trainHashes = shingled.filter(!isEval)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("n_shingles"), xxhash64(col("shingle")).as("sh_hash"))
    // guard count: doc_id column only (no text read); null-text eval docs
    // inflate the count slightly, which only biases the guard toward the
    // safe (shuffle) side
    val evalDocCount = docs.filter(isEval).select(col("doc_id")).count()
    val probe =
      if (evalDocCount <= maxBroadcastEvalDocs) broadcast(evalHashes)
      else evalHashes.hint("shuffle_hash")
    trainHashes.join(probe, "sh_hash")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6)
          .as("contamination"))
      .orderBy(col("doc_id"))
  }
}
