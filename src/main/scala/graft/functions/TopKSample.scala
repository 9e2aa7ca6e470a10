package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-K state: parallel (sortKey, id) arrays, at most k entries,
  * kept sorted by (sortKey asc, id asc). A Product of native array types
  * so the buffer rides Spark's ExpressionEncoder as
  * `struct<keys:array<string>, ids:array<bigint>>` at partial-aggregate
  * shuffle boundaries (same rationale as [[MGState]]).
  */
case class TopKState(keys: Array[String], ids: Array[Long])

/** First-K-by-key sampler as a typed Aggregator: keeps the K (sortKey,
  * id) pairs with the smallest (sortKey, id) per group — O(K) state per
  * group, merged associatively under Spark's partial aggregation.
  *
  * This is the SCALE form of per-group top-K selection: a window
  * `ROW_NUMBER() OVER (PARTITION BY g ORDER BY key)` must shuffle and
  * sort EVERY row of the group, while this aggregator's map-side
  * partials reduce each input partition to ≤K rows per group before the
  * exchange — the shuffle carries O(K × groups × partitions) no matter
  * how many rows a 100 TB group holds. With a content-hash sort key
  * (md5 — engine-portable, re-crawl-stable) the result is a
  * deterministic uniform sample, the fixed-size-per-stratum sampling
  * step of a training-data pipeline.
  *
  * Semantics are the window form's (asserted against it in tests, and
  * against the equivalent ROW_NUMBER SQL by the DuckDB oracle) with ONE
  * stated exception: rows with a NULL sort key are EXCLUDED from the
  * sample, whereas Spark's ascending window sort ranks NULL keys FIRST
  * and would admit them. A NULL content hash means null content — not a
  * meaningful sample member — so exclusion is the intended contract;
  * pre-filter nulls (as [[graft.ext.Corpus.stratifiedSample]] does) or
  * coalesce the key if window-identical behavior on null keys matters.
  * Ids are emitted in (sortKey, id) rank order.
  */
class TopKByKey(k: Int) extends Aggregator[(String, Long), TopKState, Seq[Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: TopKState = TopKState(Array.empty, Array.empty)

  /** CODE-POINT key comparison — Spark orders strings by UTF8String
    * binary comparison, which equals code-point order; Java's
    * String.compareTo is UTF-16 code-UNIT order, which ranks surrogate
    * pairs (U+10000+) BELOW [U+E000, U+FFFF] — using it would silently
    * diverge from the documented ROW_NUMBER-window equivalence on
    * non-BMP keys. Identical prefixes keep surrogate pairs aligned, so
    * comparing code points at the first differing char index is exact.
    */
  private def keyCompare(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      if (a.charAt(i) != b.charAt(i))
        return Integer.compare(a.codePointAt(i), b.codePointAt(i))
      i += 1
    }
    Integer.compare(a.length, b.length)
  }

  /** Insertion point of (key, id) in the sorted state (binary search). */
  private def insertPos(s: TopKState, key: String, id: Long): Int = {
    var lo = 0
    var hi = s.keys.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = keyCompare(s.keys(mid), key)
      if (c < 0 || (c == 0 && s.ids(mid) < id)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def reduce(s: TopKState, v: (String, Long)): TopKState = {
    val (key, id) = v
    if (key == null) return s // null sort keys are excluded by contract
    val n = s.keys.length
    if (n == k) {
      val lastC = keyCompare(s.keys(n - 1), key)
      if (lastC < 0 || (lastC == 0 && s.ids(n - 1) < id)) return s // below cut
      // full buffer: shift the tail right IN PLACE (mutating the buffer
      // is allowed by the Aggregator contract) — zero allocation on the
      // per-row hot path once a group has k entries
      val pos = insertPos(s, key, id)
      var i = k - 1
      while (i > pos) { s.keys(i) = s.keys(i - 1); s.ids(i) = s.ids(i - 1); i -= 1 }
      s.keys(pos) = key
      s.ids(pos) = id
      return s
    }
    // growing buffer (first k rows of a group): allocate n+1
    val pos = insertPos(s, key, id)
    val ks = new Array[String](n + 1)
    val is = new Array[Long](n + 1)
    System.arraycopy(s.keys, 0, ks, 0, pos)
    System.arraycopy(s.ids, 0, is, 0, pos)
    ks(pos) = key; is(pos) = id
    System.arraycopy(s.keys, pos, ks, pos + 1, n - pos)
    System.arraycopy(s.ids, pos, is, pos + 1, n - pos)
    TopKState(ks, is)
  }

  override def merge(a: TopKState, b: TopKState): TopKState = {
    // merge two sorted runs, truncate at k
    val m = math.min(a.keys.length + b.keys.length, k)
    val ks = new Array[String](m)
    val is = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeA =
        j >= b.keys.length || (i < a.keys.length && {
          val c = keyCompare(a.keys(i), b.keys(j))
          c < 0 || (c == 0 && a.ids(i) <= b.ids(j))
        })
      if (takeA) { ks(o) = a.keys(i); is(o) = a.ids(i); i += 1 }
      else { ks(o) = b.keys(j); is(o) = b.ids(j); j += 1 }
      o += 1
    }
    TopKState(ks, is)
  }

  override def finish(s: TopKState): Seq[Long] = s.ids.toSeq

  override def bufferEncoder: Encoder[TopKState] = Encoders.product[TopKState]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Bounded top-K-by-score state: parallel (score, id) arrays, at most k
  * entries, kept sorted by (score DESC, id ASC) — the ANN ranking order.
  * Same Product-of-native-arrays encoding rationale as [[TopKState]].
  */
case class TopKScoreState(scores: Array[Double], ids: Array[Long])

/** Highest-K-by-score selector as a typed Aggregator: keeps the K
  * (score, id) pairs ranking first under (score DESC, id ASC) per group
  * — O(K) state per group, merged associatively under Spark's partial
  * aggregation.
  *
  * This is the SCALE form of an ANN final: a
  * `ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, id)`
  * window must shuffle EVERY scored candidate into one sort partition
  * per query — for an exhaustive scorer that is a full corpus sort per
  * query on a single task. This aggregator's map-side partials reduce
  * each input partition to ≤K pairs per query before the exchange, so
  * the shuffle carries O(K × queries × partitions) rows no matter how
  * many candidates a 100 TB corpus contributes.
  *
  * Semantics are the window form's (asserted pairwise against it in
  * DedupSimilaritySpec for every ANN scorer) with the same stated
  * exceptions as [[TopKByKey]]: rows whose score is NULL must be
  * pre-filtered or coalesced by the caller (the primitive input encoder
  * cannot represent them — every ANN scorer in [[graft.ext.Similarity]]
  * constructs non-null scores). Score ordering matches Spark's sort:
  * NaN ranks above all other values (java.lang.Double.compare), and
  * -0.0 is normalized to 0.0 on insert (Spark's
  * NormalizeFloatingNumbers discipline). Pairs are emitted in rank
  * order, so `posexplode` recovers the 1-based rank directly.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), TopKScoreState, Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: TopKScoreState = TopKScoreState(Array.empty, Array.empty)

  /** True iff (sa, ia) ranks strictly BEFORE (sb, ib): higher score
    * first, ties to the smaller id. Double.compare gives the IEEE total
    * order Spark sorts by (NaN greatest); -0.0/0.0 never reach here
    * distinct because reduce normalizes on insert.
    */
  @inline private def before(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c > 0 || (c == 0 && ia < ib)
  }

  /** Insertion point of (score, id) in the rank-sorted state. */
  private def insertPos(s: TopKScoreState, score: Double, id: Long): Int = {
    var lo = 0
    var hi = s.scores.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(s.scores(mid), s.ids(mid), score, id)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def reduce(s: TopKScoreState, v: (Double, Long)): TopKScoreState = {
    val score = if (v._1 == 0.0) 0.0 else v._1 // normalize -0.0
    val id = v._2
    val n = s.scores.length
    if (n == k) {
      // below the cut iff the current worst kept pair still ranks first
      if (before(s.scores(n - 1), s.ids(n - 1), score, id)) return s
      // in-place tail shift once the buffer is full — zero allocation
      // on the per-candidate hot path (the TopKByKey discipline)
      val pos = insertPos(s, score, id)
      var i = k - 1
      while (i > pos) { s.scores(i) = s.scores(i - 1); s.ids(i) = s.ids(i - 1); i -= 1 }
      s.scores(pos) = score
      s.ids(pos) = id
      return s
    }
    val pos = insertPos(s, score, id)
    val ss = new Array[Double](n + 1)
    val is = new Array[Long](n + 1)
    System.arraycopy(s.scores, 0, ss, 0, pos)
    System.arraycopy(s.ids, 0, is, 0, pos)
    ss(pos) = score; is(pos) = id
    System.arraycopy(s.scores, pos, ss, pos + 1, n - pos)
    System.arraycopy(s.ids, pos, is, pos + 1, n - pos)
    TopKScoreState(ss, is)
  }

  override def merge(a: TopKScoreState, b: TopKScoreState): TopKScoreState = {
    val m = math.min(a.scores.length + b.scores.length, k)
    val ss = new Array[Double](m)
    val is = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeA =
        j >= b.scores.length || (i < a.scores.length &&
          !before(b.scores(j), b.ids(j), a.scores(i), a.ids(i)))
      if (takeA) { ss(o) = a.scores(i); is(o) = a.ids(i); i += 1 }
      else { ss(o) = b.scores(j); is(o) = b.ids(j); j += 1 }
      o += 1
    }
    TopKScoreState(ss, is)
  }

  override def finish(s: TopKScoreState): Seq[(Double, Long)] =
    s.scores.toSeq.zip(s.ids.toSeq)

  override def bufferEncoder: Encoder[TopKScoreState] =
    Encoders.product[TopKScoreState]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKSample {
  /** Column form: ids of the K smallest (sortKey, id) pairs per group,
    * in rank order — `.agg(firstKByKey(col("h"), col("id"), 20))`.
    */
  def firstKByKey(sortKey: Column, id: Column, k: Int): Column =
    udaf(new TopKByKey(k),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .apply(sortKey, id)

  /** Column form: the K (score, id) pairs ranking first under
    * (score DESC, id ASC) per group, as `array<struct<_1:double,
    * _2:bigint>>` in rank order — the bounded ANN final
    * (`.agg(topKByScore(col("cos_sim_r"), col("neighbor_id"), 5))`).
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    udaf(new TopKByScore(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)
}
