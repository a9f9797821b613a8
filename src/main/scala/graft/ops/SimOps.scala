package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH-bucketed variant as the 100 TB scale path.
  *
  * Scale design:
  *  - Brute force broadcasts the (small) query set against the full vector
  *    table — a map-side nested loop with no shuffle of the big side, then
  *    a per-query top-k (one narrow shuffle of k rows per query per
  *    partition via TakeOrdered-style aggregation).
  *  - LSH buckets both sides by a signature of sign(v · r_i) bits; only
  *    same-bucket pairs are scored. Bucket count 2^planes bounds the
  *    candidate set; recall is data-dependent and the whole point of the
  *    oracle twin is that approximate ≠ nondeterministic.
  *
  * Determinism: all scores are computed in double precision with a fixed
  * left-to-right accumulation (`aggregate(zip_with(...))`), ranked on the
  * 6-dp rounded score with vector id as tie-break, and emitted rounded to
  * 4 dp — identical in DuckDB (double-cast lists), so the oracle matches
  * exactly.
  */
object SimOps {

  /** Fixed pseudo-random hyperplanes: `planes` × `dim` entries in [-1, 1],
    * derived from the same LCG as the minhash constants. */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val it = Iterator.iterate(seed)(x => (1103515245L * x + 12345L) % DedupOps.P).drop(1)
    Seq.fill(planes)(Seq.fill(dim)(it.next().toDouble / DedupOps.P * 2 - 1))
  }

  /** cosine(a, b) in double precision, left-to-right accumulation, via the
    * codegen'd [[graft.catalyst.ArrayDotProduct]] (`array_dot`) — the HOF
    * (`aggregate(zip_with(...))`) version computes identical values but
    * evaluates interpreted, 100× slower on all-pairs workloads. Callers
    * must register [[graft.catalyst.GraftFunctions]] on the session.
    * Prefer [[withNorm]] + dividing by precomputed norms when one side is
    * scored against many (avoids recomputing norms per pair). */
  def cosine(a: String, b: String): Column =
    expr(s"array_dot($a, $b)") /
      (sqrt(expr(s"array_dot($a, $a)")) * sqrt(expr(s"array_dot($b, $b)")))

  /** Adds `normCol` = sqrt(v·v), computed once per row. */
  def withNorm(df: DataFrame, vecCol: String, normCol: String): DataFrame =
    df.withColumn(normCol, sqrt(expr(s"array_dot($vecCol, $vecCol)")))

  /** DuckDB twin: computed from double-cast lists so both sides run in
    * double precision; 4-dp output rounding absorbs the ~1e-15 tail. */
  def cosineSql(a: String, b: String): String =
    s"list_cosine_similarity(($a)::DOUBLE[], ($b)::DOUBLE[])"

  /** Brute-force exact top-k: for each query vector (filtered by
    * `queryPred`), the k nearest non-self vectors by cosine.
    */
  def topKBruteForce(vectors: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val queries = withNorm(vectors.filter(queryPred), "embedding", "qn")
      .select(col("vec_id").as("query_id"), col("embedding").as("q"), col("qn"))
    val scored = withNorm(vectors.select(col("vec_id"), col("embedding")),
        "embedding", "vn")
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(expr("array_dot(q, embedding)") / (col("qn") * col("vn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("score"), 4).as("cosine"))
  }

  def topKBruteForceSql(table: String, queryPredSql: String, k: Int): String =
    s"""WITH queries AS (SELECT vec_id AS query_id, embedding AS q
                         FROM $table WHERE $queryPredSql),
        scored AS (
          SELECT query_id, vec_id,
                 round(${cosineSql("q", "embedding")}, 6) AS score
          FROM queries CROSS JOIN $table WHERE vec_id <> query_id)
        SELECT query_id, rank, neighbor_id, cosine FROM (
          SELECT query_id, vec_id AS neighbor_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, vec_id) AS INT) AS rank,
                 round(score, 4) AS cosine
          FROM scored)
        WHERE rank <= $k ORDER BY query_id, rank"""

  /** Signature bits: sign of v · r_i per hyperplane, packed into a bucket
    * id. Vectors in the same bucket are "probably close".
    * Built with Column/typedLit, NOT an expr(...) string: inlining the
    * hyperplane constants as SQL text made multi-table bucket expressions
    * ~400 KB of SQL re-parsed on every query construction (measured ~3 s
    * of driver time at 8 tables × 4 planes × 64 dims); literal ArrayData
    * goes straight into the plan instead. */
  def lshBucket(vecCol: String, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (r, i) =>
      when(call_function("array_dot", col(vecCol), typedLit(r)) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBucketSql(vecCol: String, planes: Seq[Seq[Double]]): String = {
    val bits = planes.zipWithIndex.map { case (r, i) =>
      val arr = r.mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(($vecCol)::DOUBLE[], $arr) >= 0 THEN ${1L << i} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** LSH-bucketed approximate top-k: score only same-bucket pairs.
    * The bucket join shuffles by bucket id instead of broadcasting the
    * whole table against itself — the scale path when the query set is
    * not small. Recall < 1 by construction.
    */
  def topKLsh(vectors: DataFrame, queryPred: Column, k: Int,
              planes: Seq[Seq[Double]]): DataFrame = {
    val bucketed = withNorm(vectors, "embedding", "vn")
      .withColumn("bucket", lshBucket("embedding", planes))
    val queries = bucketed.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("vn").as("qn"), col("bucket"))
    val scored = bucketed.select(col("vec_id"), col("embedding"), col("vn"), col("bucket"))
      .join(queries, "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(expr("array_dot(q, embedding)") / (col("qn") * col("vn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("score"), 4).as("cosine"))
  }

  /** `tables` independent hyperplane sets (LSH tables) for near-dup
    * pairing: more tables raise recall (a close pair only needs to
    * collide in ONE table), more planes per table shrink buckets
    * (2^planes buckets bound candidate fan-out). */
  def lshTables(tables: Int, planes: Int, dim: Int): Seq[Seq[Seq[Double]]] =
    (0 until tables).map(t => hyperplanes(planes, dim, seed = 101L + t))

  /** Embedding-cosine near-dup pairs via multi-table hyperplane LSH —
    * the 100 TB replacement for the all-pairs self-join: candidates are
    * pairs sharing a (table, bucket) key in ANY table (a bucket equi-join,
    * shuffled by bucket id — never an O(n²) nested loop), then verified
    * with the exact cosine against the threshold. Recall < 1 is inherent
    * to LSH and tuned by (tables, planes); the oracle twin replicates the
    * identical pipeline so results still match exactly.
    */
  def cosineLshPairs(vectors: DataFrame, threshold: Double,
                     tables: Seq[Seq[Seq[Double]]]): DataFrame = {
    val v = withNorm(vectors.select(col("vec_id"), col("embedding")),
      "embedding", "n")
    // One row per (vector, table): bucket keys are scalar codegen'd
    // sign-bit packs; no embedding array ever enters the candidate shuffle.
    val keyed = v.withColumn("bks",
      array(tables.map(p => lshBucket("embedding", p)): _*))
    val buckets = keyed.select(col("vec_id"),
      posexplode(col("bks")).as(Seq("tbl", "bucket")))
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    // Exact verification on candidates only: embeddings re-join by id.
    cand
      .join(v.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("n").as("na")), "vec_a")
      .join(v.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("n").as("nb")), "vec_b")
      .withColumn("score",
        round(expr("array_dot(ea, eb)") / (col("na") * col("nb")), 6))
      .filter(col("score") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("score"), 4).as("cosine"))
  }

  def cosineLshPairsSql(table: String, threshold: Double,
                        tables: Seq[Seq[Seq[Double]]]): String = {
    val bks = tables.map(p => lshBucketSql("embedding", p)).mkString("[", ", ", "]")
    s"""WITH v AS (SELECT vec_id, embedding FROM $table),
        keyed AS (SELECT vec_id, $bks AS bks FROM v),
        buckets AS (SELECT vec_id, generate_subscripts(bks, 1) AS tbl,
                           unnest(bks) AS bucket FROM keyed),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM buckets a JOIN buckets b
            ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        verified AS (
          SELECT vec_a, vec_b,
                 round(${cosineSql("va.embedding", "vb.embedding")}, 6) AS score
          FROM cand JOIN v va ON cand.vec_a = va.vec_id
                    JOIN v vb ON cand.vec_b = vb.vec_id)
        SELECT vec_a, vec_b, round(score, 4) AS cosine FROM verified
        WHERE score >= $threshold ORDER BY vec_a, vec_b"""
  }

  def topKLshSql(table: String, queryPredSql: String, k: Int,
                 planes: Seq[Seq[Double]]): String =
    s"""WITH bucketed AS (
          SELECT vec_id, embedding,
                 ${lshBucketSql("embedding", planes)} AS bucket FROM $table),
        queries AS (SELECT vec_id AS query_id, embedding AS q, bucket
                    FROM bucketed WHERE $queryPredSql),
        scored AS (
          SELECT query_id, vec_id,
                 round(${cosineSql("q", "embedding")}, 6) AS score
          FROM queries JOIN bucketed USING (bucket)
          WHERE vec_id <> query_id)
        SELECT query_id, rank, neighbor_id, cosine FROM (
          SELECT query_id, vec_id AS neighbor_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, vec_id) AS INT) AS rank,
                 round(score, 4) AS cosine
          FROM scored)
        WHERE rank <= $k ORDER BY query_id, rank"""
}
