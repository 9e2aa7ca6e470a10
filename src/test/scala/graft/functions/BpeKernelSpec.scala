package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class BpeKernelSpec extends AnyFunSuite {

  test("train: classic Sennrich fixture learns the expected first merges") {
    // 'es' is the most frequent pair (newest 6 + widest 3 = 9), then
    // 'est' (same words), then 'lo' (low 5 + lower 2 = 7)
    val freqs = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = BpeKernel.train(freqs, 3)
    assert(merges == Vector(("e", "s"), ("es", "t"), ("l", "o")), merges.toString)
  }

  test("train: deterministic tie-break is the lexicographically smallest pair") {
    // 'ab' and 'cd' both occur twice; ("a","b") < ("c","d")
    val freqs = Map("ab" -> 2L, "cd" -> 2L)
    assert(BpeKernel.train(freqs, 1) == Vector(("a", "b")))
  }

  test("train: stops early when no pair repeats (singletons are noise)") {
    val freqs = Map("abc" -> 1L, "def" -> 1L)
    assert(BpeKernel.train(freqs, 10).isEmpty)
  }

  test("encode: round-trip concatenation reproduces every word (randomized)") {
    val rnd = new scala.util.Random(11)
    val words = (1 to 200).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val freqs = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ranks = BpeKernel.train(freqs, 50).zipWithIndex.toMap
    words.distinct.foreach { w =>
      val enc = BpeKernel.encode(w, ranks)
      assert(enc.mkString == w, s"round-trip broke for $w: $enc")
      assert(enc.forall(_.nonEmpty))
    }
  }

  test("encode: subword count is non-increasing in the number of merges") {
    val freqs = Map("banana" -> 6L, "bandana" -> 4L, "cabana" -> 3L)
    val all = BpeKernel.train(freqs, 20)
    val word = "bananarama"
    val lens = (0 to all.length).map { k =>
      BpeKernel.encode(word, all.take(k).zipWithIndex.toMap).length
    }
    assert(lens.zip(lens.tail).forall { case (a, b) => b <= a }, lens.toString)
    assert(lens.head == word.length, "zero merges must yield one symbol per char")
  }

  test("encode: applies merges in rank order, not greedily by position") {
    // ranks: ("b","c") rank 0, ("a","b") rank 1 — encoding "abc" must
    // merge bc FIRST (lower rank) even though ab is leftmost, leaving
    // a+bc with no ("a","bc") rule
    val ranks = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(BpeKernel.encode("abc", ranks) == Vector("a", "bc"))
    assert(BpeKernel.encode("", ranks).isEmpty)
    assert(BpeKernel.encode("x", ranks) == Vector("x"))
  }
}
