package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** FastSS fuzzy join: exact recall at edit distance ≤ 1 against a
  * brute-force all-pairs scan, deterministic election, and the
  * corrupted-probe contract of the registered query.
  */
class EntityResolutionSpec extends SparkTestBase {

  /** Driver-side Levenshtein for the brute-force oracle. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy join finds EXACTLY the all-pairs levenshtein <= 1 matches") {
    import spark.implicits._
    // substitutions, insertions, deletions, exact copies, misses, and
    // repeated-character strings (the deletion-key dedup case)
    val targets = Seq(1L -> "carrot", 2L -> "parrot", 3L -> "carrots",
      4L -> "carot", 5L -> "banana", 6L -> "bananna", 7L -> "xx",
      8L -> "carrot").toDF("key", "name")
    val probes = Seq(10L -> "carrot", 11L -> "bananas", 12L -> "zzz",
      13L -> "xxx", 14L -> "x").toDF("probe_id", "probe_name")
    val got = EntityResolution.fuzzyJoinDf(probes, targets).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5))))
      .toMap
    val t = targets.collect().map(r => (r.getLong(0), r.getString(1)))
    val p = probes.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = p.map { case (pid, pn) =>
      pid -> t.filter { case (_, n) => lev(pn, n) <= 1 }
        .map { case (k, n) => (lev(pn, n).toLong, k, n) }.sorted
    }.toMap
    p.foreach { case (pid, _) =>
      val want = brute(pid)
      if (want.isEmpty) assert(!got.contains(pid), s"probe $pid must not match")
      else {
        val (d, k, n) = want.head
        assert(got(pid) == ((k, n, d, want.size.toLong)),
          s"probe $pid: got ${got.get(pid)} want best=($k,$n,$d) of ${want.size}")
      }
    }
    // the fixture must exercise every branch: a tie broken by key
    // (carrot matches keys 1 and 8 at distance 0), a distance-2 miss
    // (zzz), and a no-candidate probe
    assert(got(10L)._1 == 1L && got(10L)._4 >= 3L)
    assert(!got.contains(12L))
  }

  test("registered query: every corrupted probe resolves, origin is reachable") {
    val r = EntityResolution.fuzzyCustomerMatch(spark, sfDir)
    val cust = graft.Tables.customer(spark, sfDir)
    val n = cust.count()
    val rows = r.collect()
    assert(rows.length == n, "every probe is one deletion from its origin")
    // the elected match is always at distance <= 1 and the match count
    // is >= 1; ambiguous digit-run probes must exist at fixture scale
    assert(rows.forall(x => x.getLong(4) <= 1 && x.getLong(5) >= 1))
    assert(rows.exists(_.getLong(5) > 1),
      "digit-run names must make at least one probe ambiguous")
  }

  test("fuzzy join is partition-invariant") {
    import spark.implicits._
    val targets = Seq(1L -> "alpha", 2L -> "alpah", 3L -> "beta")
      .toDF("key", "name")
    val probes = Seq(9L -> "alpha").toDF("probe_id", "probe_name")
    val a = EntityResolution.fuzzyJoinDf(probes.repartition(1), targets.repartition(1))
      .collect().map(_.toSeq)
    val b = EntityResolution.fuzzyJoinDf(probes.repartition(5), targets.repartition(3))
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
