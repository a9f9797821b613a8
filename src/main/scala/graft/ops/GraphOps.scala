package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge tables — the family
  * `DedupOps.connectedComponents` opened (driver-iterated rounds, one
  * shuffle per round), extended to NUMERIC fixpoints. First member:
  * damped PageRank, the canonical importance score over the corpus
  * k-NN graph (which documents sit in dense semantic neighborhoods —
  * a data-curation signal for coverage-weighted sampling).
  *
  * All arithmetic is exact-integer micro-units (the `sample_temperature`
  * / `sim_dim_stats` discipline): scores are BIGINT, per-edge
  * contributions are floor divisions, and the damping factor is a
  * rational (85/100) applied as multiply-then-floor-divide. Floating
  * point never appears, so partial-aggregation order, engine, partition
  * count, and retries can never move a single bit of the output.
  */
object GraphOps {

  /** Initial per-node mass, micro-units (10¹²). Headroom bound: any
    * node's inbound sum is < total corpus mass = N·S0, and the damping
    * step multiplies by 85 before dividing — so Long stays overflow-free
    * while N·S0 < Long.Max/85 ≈ 1.1e17, i.e. N up to ~10⁵ at this S0.
    * A larger deployment scales S0 down with N (the scores are relative;
    * only the ratio to S0 carries meaning). */
  val PrS0 = 1000000000000L
  /** Damping factor 0.85 as an exact rational. */
  val PrDampNum = 85L
  val PrDampDen = 100L
  /** Teleport base: S0·(1−d), exact at these constants. */
  val PrBase: Long = PrS0 * (PrDampDen - PrDampNum) / PrDampDen
  /** Gated iteration count (driver-iterated, like the CC rounds). */
  val PrIters = 3

  /** Damped PageRank, `iters` synchronous rounds. `nodes` = (node_id),
    * `edges` = directed (src, dst); dangling nodes (no out-edges)
    * contribute nothing — their mass leaks, identically on both engines
    * (documented contract, standard in practice for fixed-iteration
    * scoring).
    *
    * Scale shape: ONE shuffle per round — edges pre-joined once with
    * out-degrees and persisted (the expensive upstream edge build, e.g.
    * the LSH k-NN pipeline, thus runs exactly once); each round is
    * edges⋈scores (equi-join on src, slim (dst, contrib) rows out) →
    * hash-agg by dst with map-side combine → left-join back to nodes.
    * Rounds are O(iters), lineage stays shallow (no growing plan: each
    * round's frame references only the previous round and the cached
    * edge table). */
  def pageRank(nodes: DataFrame, edges: DataFrame,
               iters: Int = PrIters): DataFrame = {
    val outd = edges.groupBy("src").agg(count(lit(1)).as("od"))
    val eo = edges.select("src", "dst").join(outd, "src").persist()
    var r = nodes.select(col("node_id"), lit(PrS0).as("pr"))
    for (_ <- 1 to iters) {
      val inbound = eo.join(r, eo("src") === r("node_id"))
        .select(col("dst"), expr("pr div od").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
      r = nodes.select("node_id")
        .join(inbound, col("node_id") === inbound("dst"), "left")
        .select(col("node_id"),
          (lit(PrBase) + expr(
            s"($PrDampNum * coalesce(m, CAST(0 AS BIGINT))) div $PrDampDen"))
            .as("pr"))
    }
    r.select(col("node_id"), col("pr").as("pagerank"))
  }

  /** Oracle twin of [[pageRank]]: the same rounds as chained CTEs (the
    * `text_bpe_merges` replay pattern). DuckDB widens integer SUM to
    * HUGEINT internally; the final CAST restores BIGINT — values are
    * identical because both engines stay inside the documented overflow
    * bound. */
  def pageRankSql(nodesSql: String, edgesSql: String,
                  iters: Int = PrIters): String = {
    val its = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"it${i - 1}"
      s"""it$i AS (SELECT n.node_id,
            CAST($PrBase + ($PrDampNum * COALESCE(s.m, 0)) // $PrDampDen
                 AS BIGINT) AS pr
            FROM nodes n LEFT JOIN (
              SELECT e.dst, SUM(p.pr // o.od) AS m
              FROM edges e JOIN $prev p ON e.src = p.node_id
                           JOIN outd o ON e.src = o.src
              GROUP BY e.dst) s ON n.node_id = s.dst)"""
    }
    s"""WITH nodes AS ($nodesSql),
        edges AS ($edgesSql),
        outd AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
        r0 AS (SELECT node_id, CAST($PrS0 AS BIGINT) AS pr FROM nodes),
        ${its.mkString(",\n        ")}
        SELECT node_id, pr AS pagerank FROM it$iters ORDER BY node_id"""
  }
}
