package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property tests backing the rows-only adjudication of the
  * q_unigram_* trio (the BpeKernelSpec discipline for the other
  * canonical subword scheme): the hard-EM loop isn't SQL-expressible,
  * so kernel correctness lives here.
  */
class UnigramKernelSpec extends AnyFunSuite {

  test("viterbi: concatenation reproduces every word (randomized)") {
    val rnd = new scala.util.Random(17)
    val words = (1 to 200).map(_ =>
      (1 to (1 + rnd.nextInt(14))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val freqs = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val logp = UnigramKernel.train(freqs, targetVocab = 64).toMap
    words.foreach { w =>
      assert(UnigramKernel.viterbi(w, logp).mkString == w, w)
    }
  }

  test("viterbi: matches brute-force max-logp segmentation on short words") {
    // hand vocab: 'ab' strongly preferred over 'a'+'b'
    val logp = Map("a" -> -3.0, "b" -> -3.0, "c" -> -2.5, "ab" -> -1.0, "abc" -> -5.0)
    def brute(w: String): Double = {
      // max total logp over all segmentations (unknown singles at UnkLogp)
      def go(i: Int): Double =
        if (i == w.length) 0.0
        else (1 to math.min(UnigramKernel.MaxPieceLen, w.length - i)).map { len =>
          val p = w.substring(i, i + len)
          val s = logp.getOrElse(p,
            if (len == 1) UnigramKernel.UnkLogp else Double.NegativeInfinity)
          if (s == Double.NegativeInfinity) Double.NegativeInfinity
          else s + go(i + len)
        }.max
      go(0)
    }
    Seq("ab", "abc", "abab", "cab", "ba", "abcab", "zzz").foreach { w =>
      val segs = UnigramKernel.viterbi(w, logp)
      val got = segs.map(p => logp.getOrElse(p, UnigramKernel.UnkLogp)).sum
      assert(math.abs(got - brute(w)) < 1e-12, s"$w -> $segs")
      assert(segs.mkString == w)
    }
  }

  test("train: repeated bigram corpus learns the multi-char piece (compression)") {
    val freqs = Map("ababab" -> 20L, "ab" -> 10L, "ba" -> 1L)
    val logp = UnigramKernel.train(freqs, targetVocab = 16).toMap
    // 'ababab' must segment into fewer pieces than its 6 characters —
    // the whole point of a subword scheme
    val segs = UnigramKernel.viterbi("ababab", logp)
    assert(segs.length < 6, segs.toString)
    assert(segs.mkString == "ababab")
  }

  test("train: deterministic — two runs on the same frequencies are identical") {
    val rnd = new scala.util.Random(23)
    val freqs = (1 to 80).map(_ =>
      (1 to (2 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      .groupBy(identity).view.mapValues(_.size.toLong * 3).toMap
    val a = UnigramKernel.train(freqs, targetVocab = 40)
    val b = UnigramKernel.train(freqs, targetVocab = 40)
    assert(a == b)
  }

  test("train: every sample character survives pruning (coverage invariant)") {
    val freqs = Map("abcdef" -> 5L, "ggg" -> 2L, "ha" -> 1L)
    val vocab = UnigramKernel.train(freqs, targetVocab = 8).toMap
    "abcdefgh".foreach { ch =>
      assert(vocab.contains(ch.toString), s"missing single char $ch")
    }
  }

  test("train: vocabulary respects the target size (modulo unconditional singles)") {
    val rnd = new scala.util.Random(31)
    val freqs = (1 to 60).map(_ =>
      (3 to 3 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nSingles = freqs.keys.flatMap(_.toSeq).toSet.size
    val vocab = UnigramKernel.train(freqs, targetVocab = 12)
    assert(vocab.size <= math.max(12, nSingles), vocab.size.toString)
  }

  test("train: empty and degenerate inputs") {
    assert(UnigramKernel.train(Map.empty, 10).isEmpty)
    assert(UnigramKernel.train(Map("" -> 5L), 10).isEmpty)
    val one = UnigramKernel.train(Map("a" -> 1L), 10).toMap
    assert(one.keySet == Set("a"))
  }

  test("viterbi: unknown characters fall to the UnkLogp floor, never fail") {
    val logp = Map("a" -> -1.0)
    val segs = UnigramKernel.viterbi("axa", logp)
    assert(segs == Vector("a", "x", "a"))
  }
}
