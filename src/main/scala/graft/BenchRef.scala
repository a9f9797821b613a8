package graft

/** Parser for [[Bench]]'s own one-line JSON artifacts — the reference
  * timings that seed the contention-rerun defense's expectations.
  *
  * Anchored to the `"queries":{...}` span (round-12 verdict #4): the
  * previous flat first-occurrence scan over the whole line depended on
  * field ORDER — an artifact whose `"reran"` block preceded
  * `"queries"` would have seeded expectations from the spiked
  * first-pass echoes instead of the accepted timings. The queries map
  * is flat (`"name":secs` pairs, no nested objects), so the span ends
  * at the first `}` after the anchor; everything outside it is
  * ignored by construction, whatever order the writer used.
  */
object BenchRef {
  private val Pair =
    java.util.regex.Pattern.compile("\"([A-Za-z0-9_]+)\":(-?[0-9.]+(?:[Ee][+-]?[0-9]+)?)")

  /** name → seconds from the artifact's "queries" map; crashed (-1)
    * and zero rows are dropped. Empty map when the anchor is absent
    * or the span is unterminated (a truncated artifact). */
  def parseQueries(txt: String): Map[String, Double] = {
    val anchor = "\"queries\":{"
    val i = txt.indexOf(anchor)
    if (i < 0) return Map.empty
    val start = i + anchor.length
    val end = txt.indexOf('}', start)
    if (end < 0) return Map.empty
    val m = Pair.matcher(txt.substring(start, end))
    val b = scala.collection.mutable.Map[String, Double]()
    while (m.find()) {
      try {
        val v = m.group(2).toDouble
        if (v > 0 && !b.contains(m.group(1))) b(m.group(1)) = v
      } catch { case _: NumberFormatException => () }
    }
    b.toMap
  }
}
