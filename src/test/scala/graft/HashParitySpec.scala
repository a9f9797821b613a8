package graft

import org.apache.spark.sql.types._

/** Hash-stability contract for every gated query: the driver's correctness
  * gate canonicalizes result *representations*, not just values, so the
  * output schema itself is part of the contract. Round 2 shipped 10
  * value-exact queries that failed the driver's hash purely on rendering
  * (DECIMAL trailing zeros vs DOUBLE; DuckDB HUGEINT sums vs BIGINT).
  * This suite pins the schema-level rules that make that defect class
  * impossible to reintroduce; the type-level DESCRIBE-vs-DESCRIBE parity
  * with the DuckDB oracle runs in `scripts/check.py --strict` (DuckDB is
  * driver-side only and not on the sbt classpath).
  */
class HashParitySpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  // The only types whose VARCHAR rendering both engines agree on. Notably
  // absent: DecimalType ("25.0000" vs "25.0" — the round-2 red class),
  // Byte/Short (width drift), CalendarInterval, and nested types other
  // than none at all (gated outputs are flat; nested values would make
  // the row-hash depend on engine-specific serialization).
  private def renderStable(t: DataType): Boolean = t match {
    case IntegerType | LongType | FloatType | DoubleType | StringType |
         BooleanType | TimestampType | DateType | BinaryType => true
    // Naive (no-timezone) timestamps are DuckDB's own TIMESTAMP: both
    // engines render them identically with no zone math involved —
    // strict gate confirms (q_window_lag passes DESCRIBE + rendering
    // parity at every SF). The session is pinned UTC either way.
    case TimestampNTZType => true
    case _ => false
  }

  test("every gated output column is a flat, rendering-stable type (no DECIMAL)") {
    val bad = Catalog.all.filter(_.oracle.isDefined).flatMap { q =>
      q.run(spark, d).schema.fields.collect {
        case f if !renderStable(f.dataType) => s"${q.name}.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty, s"rendering-unstable gated outputs:\n${bad.mkString("\n")}")
  }

  test("every gated query has a deterministic presentation order or is aggregate-small") {
    // The driver hash sorts rows; a non-deterministic dump order is fine
    // for it but presentOrder + the oracle ORDER BY keep the dumps
    // byte-comparable across runs. Flag gated queries with neither a
    // presentOrder nor a LIMIT-style tiny result only if they exceed a
    // handful of rows at sf0.001.
    val loose = Catalog.all.filter(q => q.oracle.isDefined && q.presentOrder.isEmpty)
    val bad = loose.filter(q => q.run(spark, d).limit(51).count() > 50)
    assert(bad.isEmpty,
      s"gated queries with >50 rows and no presentOrder: ${bad.map(_.name).mkString(", ")}")
  }

  test("integer-typed sums stay BIGINT-width on the Spark side") {
    // DuckDB widens sum(INT/BIGINT) to HUGEINT; the oracle casts back to
    // BIGINT. The Spark twin must therefore emit LongType, never a
    // decimal-widened or int-narrowed sum.
    val sumCols = Seq(
      "q_sessionize" -> "session_id",
      "q_fuzzy_join" -> "n_matches",
      "text_token_stats" -> "total_tokens",
      "pipeline_corpus_curation" -> "total_tokens")
    sumCols.foreach { case (q, c) =>
      val t = Catalog.queries(q)(spark, d).schema(c).dataType
      assert(t == LongType, s"$q.$c must be BIGINT, got ${t.sql}")
    }
  }
}
