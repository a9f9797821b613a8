package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ops.{DedupOps, TextOps}

/** Corpus-level sketching: per-source MinHash sketches via the typed
  * mergeable [[MinHashSketchAgg]], compared pairwise for estimated
  * shingle-Jaccard between source corpora. The DuckDB oracle recomputes
  * the same signatures from the same (a, b, p) constants, proving the
  * Aggregator's reduce/merge path equals the closed-form SQL.
  */
object SketchQueries {

  val K: Int = graft.catalyst.MinHashSketchAgg.SketchK

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_source_sketch_sim",
      (s, d) => {
        // minhash_sketch = MinHashSketchAgg surfaced as a registered UDAF:
        // plain relational groupBy, no typed-encoder overhead.
        graft.catalyst.GraftFunctions.register(s)
        // (source, shingle_hash) inverted index — hash post-explode, codegen.
        val inv = Tables.documents(s, d)
          .withColumn("__toks", TextOps.tokens(col("text")))
          .select(col("source"), explode(TextOps.shingleStrings("__toks")).as("__s"))
          .select(col("source"), TextOps.hash64(col("__s")).as("h"))
        val sigs = inv.groupBy("source")
          .agg(expr("minhash_sketch(h)").as("sig"))
        // Pairwise estimated Jaccard = fraction of agreeing slots.
        sigs.as("a").join(sigs.as("b"), col("a.source") < col("b.source"))
          .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
            round(expr(s"size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v)) / ${K}D"), 4)
              .as("est_jaccard"))
      },
      Some {
        val sh = TextOps.shingleHashesSql(TextOps.tokensSql("text"))
        val mins = DedupOps.minhashCoeffs(K).zipWithIndex.map { case ((a, b), i) =>
          s"min(($a * (h % ${DedupOps.P}) + $b) % ${DedupOps.P}) AS m$i"
        }.mkString(", ")
        // Flat list literal, not a 128-term `+` chain: DuckDB binds the
        // chain left-deep and trips its recursion limit at k=128.
        val agree = (0 until K)
          .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
          .mkString("list_sum([", ", ", "])")
        s"""WITH inv AS (SELECT source, unnest($sh) AS h FROM documents),
            sig AS (SELECT source, $mins FROM inv GROUP BY source)
            SELECT a.source AS src_a, b.source AS src_b,
                   round(($agree) / $K.0, 4) AS est_jaccard
            FROM sig a JOIN sig b ON a.source < b.source
            ORDER BY src_a, src_b"""
      },
      presentOrder = Seq("src_a", "src_b"))
  )
}
