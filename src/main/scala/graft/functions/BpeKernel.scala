package graft.functions

/** Byte-pair-encoding kernel (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"; merge-loop shape of
  * the reference GPT-2 encoder): pure functions over driver-side word
  * frequencies, shared by the training entry point and the
  * property-tested encode path in [[graft.ext.TextAnalysis]].
  *
  * Symbols are plain characters (no end-of-word sentinel): merges never
  * cross word boundaries because encoding is per word, which is the
  * only property the sentinel buys when subwords are used for counting
  * rather than detokenization.
  */
object BpeKernel {

  /** Learn `nMerges` merges from word frequencies. Each step merges the
    * most frequent adjacent symbol pair (ties broken by the
    * lexicographically smallest (left, right) pair so training is
    * deterministic regardless of map iteration order) and stops early
    * when no pair occurs twice — merging singleton pairs would just
    * memorize the sample tail.
    */
  def train(wordFreqs: Map[String, Long], nMerges: Int): Vector[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    var words: Vector[(Vector[String], Long)] =
      wordFreqs.iterator.filter(_._1.nonEmpty)
        .map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      val best = counts.iterator.filter(_._2 >= 2L).reduceOption { (a, b) =>
        if (a._2 != b._2) { if (a._2 > b._2) a else b }
        else if (implicitly[Ordering[(String, String)]].lt(a._1, b._1)) a else b
      }
      best match {
        case None => done = true
        case Some((pair, _)) =>
          merges += pair
          words = words.map { case (syms, f) => (mergeOnce(syms, pair), f) }
          k += 1
      }
    }
    merges.result()
  }

  /** One left-to-right pass replacing every non-overlapping occurrence
    * of `pair` with its concatenation.
    */
  private def mergeOnce(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word under ranked merges: repeatedly apply the
    * LOWEST-RANK merge whose pair is adjacent somewhere in the current
    * symbol sequence (the GPT-2 `bpe()` loop) until none applies.
    * Returns the subword symbols; their concatenation always equals the
    * word (merging only ever concatenates adjacent symbols).
    */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) continue = false
      else {
        syms = mergeOnce(syms, bestPair)
        continue = syms.length > 1
      }
    }
    syms
  }
}
