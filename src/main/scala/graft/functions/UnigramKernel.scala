package graft.functions

/** Unigram-LM subword tokenizer kernel (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates" — the SentencePiece `unigram` model):
  * pure functions over driver-side word frequencies, the BPE-companion
  * scheme ([[BpeKernel]] precedent — same bounded-sample training
  * shape, same property-tested-kernel discipline).
  *
  * Differences from the paper kept deliberate and documented:
  *  - HARD EM (Viterbi counts) instead of forward–backward expected
  *    counts: the E-step segments each word TYPE under the current
  *    piece log-probs and counts the winning pieces. Hard EM converges
  *    to the same vocabulary ranking on word-frequency data and keeps
  *    the kernel exactly replayable (no float-sum-order sensitivity
  *    inside a lattice marginal).
  *  - Seeding enumerates ALL substrings up to [[MaxPieceLen]] of the
  *    capped word-type table instead of a suffix-array top-N: the
  *    word-type table is already vocabulary-bounded upstream, so full
  *    enumeration is O(types × len × MaxPieceLen) driver work and
  *    strictly more complete than a suffix-array sample at this size.
  *  - Pruning keeps every single character unconditionally (the paper
  *    does too — segmentation must never fail), then the top
  *    multi-char pieces by expected count; one prune step to the
  *    target size rather than the paper's geometric shrink ladder,
  *    because the seed here is already near the target scale.
  *
  * Determinism: every map iteration that feeds an accumulation or a
  * selection is sorted (piece asc), ties in selections break on
  * (count desc, piece asc), and Viterbi ties break toward the
  * EARLIEST split point of the scan order below — training twice on
  * the same frequencies is bit-identical.
  */
object UnigramKernel {

  /** Longest candidate piece, in characters. 8 covers the
    * high-fertility tail (whole short words become single pieces)
    * without letting the seed table blow up quadratically.
    */
  val MaxPieceLen = 8

  /** Log-prob floor for an out-of-vocabulary single character (a char
    * the training sample never saw): effectively "worse than any real
    * piece" while keeping every word segmentable.
    */
  val UnkLogp: Double = -1e4

  /** All candidate pieces of one word — every substring of length
    * 1..[[MaxPieceLen]], WITH multiplicity (a substring occurring
    * twice contributes twice). The per-word half of the seed count;
    * the distributed trainer runs this as the explode kernel and
    * aggregates by piece, the driver-side [[seedVocab]] folds it
    * directly — identical counts either way.
    */
  def seedPiecesOf(word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      var len = 1
      while (len <= MaxPieceLen && i + len <= word.length) {
        out += word.substring(i, i + len)
        len += 1
      }
      i += 1
    }
    out.result()
  }

  /** Cap a seed count table: all single characters unconditionally,
    * multi-char pieces top-`maxSeed` by (count desc, piece asc).
    */
  def capSeed(counts: Map[String, Long], maxSeed: Int): Map[String, Long] = {
    val (singles, multis) = counts.toSeq.partition(_._1.length == 1)
    val kept = multis.sortBy { case (p, c) => (-c, p) }.take(maxSeed)
    (singles ++ kept).toMap
  }

  /** Substring-seeded candidate vocabulary: every substring of length
    * 1..[[MaxPieceLen]] of every word type, counted by word frequency
    * (a substring occurring twice in one word counts twice). All
    * single characters are kept unconditionally; multi-char pieces cap
    * at `maxSeed` by (count desc, piece asc).
    */
  def seedVocab(wordFreqs: Map[String, Long], maxSeed: Int): Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    wordFreqs.toSeq.sortBy(_._1).foreach { case (w, f) =>
      seedPiecesOf(w).foreach { p =>
        counts.update(p, counts.getOrElse(p, 0L) + f)
      }
    }
    capSeed(counts.toMap, maxSeed)
  }

  /** Viterbi best segmentation of `word` under piece log-probs: the
    * max-total-logp split, DP over end positions. Unknown single
    * characters score [[UnkLogp]] so a path always exists; ties break
    * toward the earliest split point (fixed scan order), making the
    * output deterministic.
    */
  def viterbi(word: String, logp: Map[String, Double]): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (best(j) > Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          val s = logp.get(piece) match {
            case Some(lp) => lp
            case None => if (i - j == 1) UnkLogp else Double.NegativeInfinity
          }
          val cand = best(j) + s
          if (cand > best(i)) { best(i) = cand; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var k = n
    while (k > 0) { rev += ((back(k), k)); k = back(k) }
    rev.reverseIterator.foreach { case (a, b) => out += word.substring(a, b) }
    out.result().toVector
  }

  /** Normalize counts to log-probs: ln(c / total). Pieces with zero
    * count are dropped by the caller before this.
    */
  def toLogp(counts: Map[String, Long]): Map[String, Double] = {
    val total = counts.valuesIterator.sum.toDouble
    counts.map { case (p, c) => p -> math.log(c / total) }
  }

  /** The E-step coverage floor: single characters of the CURRENT
    * vocabulary that lost every Viterbi race re-enter at count 1 so
    * segmentation coverage never degrades round-over-round (the
    * paper's never-prune-chars invariant applied to the E-step).
    * Shared by the driver-side and distributed trainers.
    */
  def withSingleFloor(counts: Map[String, Long],
                      vocab: Iterable[String]): Map[String, Long] = {
    val missing = vocab.iterator
      .filter(p => p.length == 1 && !counts.contains(p)).toSeq.sorted
    counts ++ missing.map(_ -> 1L)
  }

  /** The prune step: all single characters unconditionally, then the
    * top multi-char pieces by (count desc, piece asc) until
    * `targetVocab`.
    */
  def pruneCounts(counts: Map[String, Long], targetVocab: Int): Map[String, Long] = {
    val (singles, multis) = counts.toSeq.partition(_._1.length == 1)
    val keptMultis = multis.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, targetVocab - singles.length))
    (singles ++ keptMultis).toMap
  }

  /** Final ranking: log-probs sorted (logprob desc, piece asc). */
  def rankPieces(counts: Map[String, Long]): Vector[(String, Double)] =
    toLogp(counts).toVector.sortBy { case (p, lp) => (-lp, p) }

  /** One hard-EM round: Viterbi-segment every word type under the
    * current log-probs, accumulate piece counts weighted by word
    * frequency. Single characters that lose every Viterbi race keep a
    * floor count of 1 so segmentation coverage never degrades (the
    * paper's never-prune-chars invariant applied to the E-step).
    */
  private def emRound(wordFreqs: Map[String, Long],
                      logp: Map[String, Double]): Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    wordFreqs.toSeq.sortBy(_._1).foreach { case (w, f) =>
      viterbi(w, logp).foreach { p =>
        counts.update(p, counts.getOrElse(p, 0L) + f)
      }
    }
    withSingleFloor(counts.toMap, logp.keys)
  }

  /** Train the unigram vocabulary: substring seed → `emRounds` hard-EM
    * rounds → ONE prune to `targetVocab` ([[pruneCounts]]) → one
    * settling EM round on the pruned vocabulary. Returns (piece,
    * logprob) sorted by (logprob desc, piece asc).
    *
    * This is the driver-side REFERENCE implementation; the production
    * path is [[graft.ext.TextAnalysis]]'s distributed trainer, which
    * runs the identical E-step as a per-word-type kernel + one keyed
    * integer aggregate per round and is asserted EQUAL to this on a
    * shared fixture (integer counts + total-order tie-breaks make the
    * two bit-identical regardless of partitioning).
    */
  def train(wordFreqs: Map[String, Long], targetVocab: Int,
            emRounds: Int = 3, maxSeed: Int = 8192): Vector[(String, Double)] = {
    require(targetVocab >= 1, s"targetVocab must be >= 1, got $targetVocab")
    val live = wordFreqs.filter(_._1.nonEmpty)
    if (live.isEmpty) return Vector.empty
    var counts = seedVocab(live, maxSeed)
    var r = 0
    while (r < emRounds) {
      counts = emRound(live, toLogp(counts))
      r += 1
    }
    counts = emRound(live, toLogp(pruneCounts(counts, targetVocab)))
    rankPieces(counts)
  }
}
