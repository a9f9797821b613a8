package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 verdict #4: the bench reference parser must not depend on
  * the artifact's field ORDER — a "reran" block (echoing spiked
  * first-pass times) preceding "queries" must not seed expectations. */
class BenchRefSpec extends AnyFunSuite {

  private val canonical =
    """{"metric":"total","value":12.5,"unit":"sec",""" +
      """"queries":{"q_a":1.5,"q_b":0.25,"q_crash":-1.0,"q_c":3.0E-2},""" +
      """"errors":["q_crash"],"reran":{"q_a":9.9},"sf":"/x/sf0.1"}"""

  private val reordered =
    """{"reran":{"q_a":9.9,"q_new":7.7},"metric":"total",""" +
      """"errors":["q_crash"],""" +
      """"queries":{"q_a":1.5,"q_b":0.25,"q_crash":-1.0,"q_c":3.0E-2},""" +
      """"value":12.5,"sf":"/x/sf0.1"}"""

  test("queries span parses: positive secs kept, crashed -1 dropped, " +
    "scientific notation read") {
    val m = BenchRef.parseQueries(canonical)
    assert(m === Map("q_a" -> 1.5, "q_b" -> 0.25, "q_c" -> 0.03))
  }

  test("a reran/errors block BEFORE the queries map yields identical " +
    "expectations — reran echoes are never read") {
    assert(BenchRef.parseQueries(reordered) ===
      BenchRef.parseQueries(canonical))
  }

  test("missing anchor or truncated span yields empty, not garbage") {
    assert(BenchRef.parseQueries("""{"value":3.0}""") === Map.empty)
    assert(BenchRef.parseQueries(
      """{"queries":{"q_a":1.5""") === Map.empty)
  }
}
