package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (Fellegi &
  * Sunter, "A Theory for Record Linkage", JASA 1969), the standard
  * framework behind every production entity-resolution system: candidate
  * pairs from BLOCKING, per-field agreement likelihood ratios
  * m/u (agree) vs (1−m)/(1−u) (disagree), a composite score that is the
  * product of the field ratios under conditional independence, and a
  * two-threshold decision rule (match / possible-match-for-clerical-
  * review / non-match).
  *
  * Engine-exactness: the classical formulation sums log-weights; this
  * implementation multiplies the UNLOGGED ratios in fixed-point micro
  * units with floor division — the identical monotone statistic (log is
  * order-preserving), and every intermediate is a BIGINT both engines
  * agree on. The m probabilities are declared model constants (as in
  * practice, where they come from a labeled sample or EM); the u
  * probabilities are estimated FROM THE DATA as the exact rational
  * agreement probability of a uniformly random record pair:
  * u_f = Σ_v c_v(c_v−1) / (n(n−1)) in micro units — the standard
  * frequency-based u estimate, computed distributed.
  *
  * Per-field ratios are clipped to [[FsClipLo]]..[[FsClipHi]] (1/32× ..
  * 32×): the clip bounds the four-factor product at 1e6·32⁴ ≈ 1.05e12
  * and the largest intermediate multiply at ~1.05e18 < 2⁶³ — overflow-
  * free by construction (the DSIR discipline).
  *
  * Scale shape: blocking keys (name noun × size) bound candidate
  * generation — the self-join is quadratic ONLY within a block, the
  * standard linkage tradeoff (block-size skew is AQE skew-join
  * territory; at crawl scale the block key must keep blocks bounded,
  * e.g. add a second key). The four u statistics are value-distinct
  * hash-aggs broadcast as one-row frames; scoring is narrow arithmetic
  * on the pair stream; the published summary is a tiny hash-agg by
  * block noun.
  */
object LinkOps {

  /** m = P(field agrees | records truly match), micro. One declared
    * constant for all four fields (a labeled sample would refine). */
  val FsM = 950000L

  /** Per-field ratio clip: [1/32×, 32×] micro. */
  val FsClipLo = 31250L
  val FsClipHi = 32000000L

  /** Decision thresholds on the composite micro ratio: ≥32× → match,
    * ≥1× → possible (clerical review), else non-match. */
  val FsThMatch = 32000000L
  val FsThPossible = 1000000L

  private def uMicroAgg(rec: DataFrame, field: String, as: String) =
    rec.groupBy(col(field)).agg(count(lit(1)).as("cv"))
      .agg(expr(
        s"""CAST(sum(CAST(cv AS DECIMAL(38,0)) * (cv - 1)) * 1000000 div
            (CAST(sum(cv) AS DECIMAL(38,0)) * (sum(cv) - 1)) AS BIGINT)""")
        .as(as))

  /** FS linkage over the part catalog: records blocked on
    * (name noun, size); fields compared = name adjective, brand, type,
    * price bucket (floor(price)/100). Published: per-noun decision
    * summary — pair counts by decision plus the score range. */
  def fellegiSunter(part: DataFrame): DataFrame = {
    val rec = part.select(col("p_partkey").as("rid"),
      regexp_extract(col("p_name"), "[^ ]+$", 0).as("noun"),
      regexp_extract(col("p_name"), "^[^ ]+", 0).as("adj"),
      col("p_brand").as("brand"), col("p_type").as("ptype"),
      col("p_size").as("sz"),
      expr("CAST(floor(p_retailprice) AS BIGINT) div 100").as("price_b"))
      .localCheckpoint()
    val us = uMicroAgg(rec, "adj", "u_adj")
      .crossJoin(uMicroAgg(rec, "brand", "u_brand"))
      .crossJoin(uMicroAgg(rec, "ptype", "u_type"))
      .crossJoin(uMicroAgg(rec, "price_b", "u_price"))
    val a = rec.select(col("rid").as("ra"), col("noun"), col("sz"),
      col("adj").as("fa1"), col("brand").as("fa2"), col("ptype").as("fa3"),
      col("price_b").as("fa4"))
    val b = rec.select(col("rid").as("rb"), col("noun"), col("sz"),
      col("adj").as("fb1"), col("brand").as("fb2"), col("ptype").as("fb3"),
      col("price_b").as("fb4"))
    def r(i: Int, u: String): Column = least(greatest(
      when(col(s"fa$i") === col(s"fb$i"),
        expr(s"(${FsM}L * 1000000L) div greatest($u, 1L)"))
        .otherwise(expr(
          s"((1000000L - ${FsM}L) * 1000000L) div greatest(1000000L - $u, 1L)")),
      lit(FsClipLo)), lit(FsClipHi))
    val pairs = a.join(b, Seq("noun", "sz")).filter(col("ra") < col("rb"))
      .crossJoin(broadcast(us))
      .withColumn("r1", r(1, "u_adj")).withColumn("r2", r(2, "u_brand"))
      .withColumn("r3", r(3, "u_type")).withColumn("r4", r(4, "u_price"))
      .withColumn("score", expr(
        "((((r1 * r2) div 1000000L) * r3) div 1000000L) * r4 div 1000000L"))
      .withColumn("decision",
        when(col("score") >= FsThMatch, "match")
          .when(col("score") >= FsThPossible, "possible")
          .otherwise("nonmatch"))
    pairs.groupBy(col("noun")).agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("decision") === "match", 1L).otherwise(0L)).as("n_match"),
      sum(when(col("decision") === "possible", 1L).otherwise(0L))
        .as("n_possible"),
      sum(when(col("decision") === "nonmatch", 1L).otherwise(0L))
        .as("n_nonmatch"),
      max(col("score")).as("max_score"),
      min(col("score")).as("min_score"))
  }

  /** Oracle twin of [[fellegiSunter]]: identical u estimates, clipped
    * ratios, fold order, and thresholds in DuckDB. */
  def fellegiSunterSql(table: String): String = {
    def u(field: String): String =
      s"""SELECT CAST(sum(CAST(cv AS HUGEINT) * (cv - 1)) * 1000000 //
            (CAST(sum(cv) AS HUGEINT) * (sum(cv) - 1)) AS BIGINT)
          FROM (SELECT count(*) AS cv FROM rec GROUP BY $field)"""
    def r(i: Int, uName: String): String =
      s"""least(greatest(CASE WHEN fa$i = fb$i
            THEN (CAST($FsM AS BIGINT) * 1000000) // greatest($uName, 1)
            ELSE (CAST(${1000000L - FsM} AS BIGINT) * 1000000) //
                 greatest(1000000 - $uName, 1) END,
          CAST($FsClipLo AS BIGINT)), CAST($FsClipHi AS BIGINT))"""
    s"""WITH rec AS (SELECT p_partkey AS rid,
          regexp_extract(p_name, '[^ ]+$$') AS noun,
          regexp_extract(p_name, '^[^ ]+') AS adj,
          p_brand AS brand, p_type AS ptype, p_size AS sz,
          CAST(floor(p_retailprice) AS BIGINT) // 100 AS price_b
          FROM $table),
        us AS (SELECT (${u("adj")}) AS u_adj, (${u("brand")}) AS u_brand,
          (${u("ptype")}) AS u_type, (${u("price_b")}) AS u_price),
        pr AS (SELECT a.noun,
            ${r(1, "u_adj")} AS r1, ${r(2, "u_brand")} AS r2,
            ${r(3, "u_type")} AS r3, ${r(4, "u_price")} AS r4
          FROM (SELECT rid AS ra, noun, sz, adj AS fa1, brand AS fa2,
                  ptype AS fa3, price_b AS fa4 FROM rec) a
          JOIN (SELECT rid AS rb, noun, sz, adj AS fb1, brand AS fb2,
                  ptype AS fb3, price_b AS fb4 FROM rec) b
            USING (noun, sz)
          CROSS JOIN us
          WHERE ra < rb),
        sc AS (SELECT noun,
            ((((r1 * r2) // 1000000) * r3) // 1000000) * r4 // 1000000
              AS score
          FROM pr),
        dec AS (SELECT noun, score,
            CASE WHEN score >= $FsThMatch THEN 'match'
                 WHEN score >= $FsThPossible THEN 'possible'
                 ELSE 'nonmatch' END AS decision
          FROM sc)
        SELECT noun, CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(sum(CASE WHEN decision = 'match' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_match,
          CAST(sum(CASE WHEN decision = 'possible' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_possible,
          CAST(sum(CASE WHEN decision = 'nonmatch' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nonmatch,
          max(score) AS max_score, min(score) AS min_score
        FROM dec GROUP BY noun ORDER BY noun"""
  }

  /** Length-aware partition/probe grids for [[passJoin]]: for every
    * key length l in [k+1, keyLen], the k+1 even segments (the
    * paper's allocation — the first (k+1) − (l mod (k+1)) segments
    * get ⌊l/(k+1)⌋ chars, the rest ⌈l/(k+1)⌉), and for every (l, i)
    * the probe-start window within ±k of the segment start (the
    * pigeonhole shift bound; the per-key upper clip happens at join
    * time because it depends on the probe key's own length). Both
    * grids are tiny literal tables (≤ keyLen·(k+1)·(2k+1) rows),
    * broadcast on the Spark side and inlined as VALUES in the
    * oracle. */
  private def lenGrids(keyLen: Int, k: Int)
  : (Seq[(Int, Int, Int, Int)], Seq[(Int, Int, Int, Int)]) = {
    val nSeg = k + 1
    val segs = for {
      l <- nSeg to keyLen
      i <- 1 to nSeg
    } yield {
      val base = l / nSeg
      val nBig = l % nSeg
      val lenI = if (i <= nSeg - nBig) base else base + 1
      val start = 1 + (i - 1) * base + math.max(0, i - 1 - (nSeg - nBig))
      (l, i, start, lenI)
    }
    val probes = for {
      (l, i, s, len) <- segs
      p <- math.max(1, s - k) to (s + k)
    } yield (l, i, p, len)
    (segs, probes)
  }

  /** Edit-distance similarity self-join via segment pigeonholing —
    * PassJoin (Li, Deng & Feng, "PASS-JOIN: a partition-based method
    * for similarity joins", VLDB 2011), the fuzzy-key linkage pass a
    * curation pipeline runs over titles/URLs/IDs: all pairs of docs
    * whose key (the text prefix, capped at `keyLen` chars — SHORTER
    * keys participate with their full length, the paper's
    * length-grouped allocation, not a fixed-width filter) is within
    * `k` edits.
    *
    * EXACT by pigeonhole: cut each indexed key of length l into k+1
    * even segments; any edit script with ≤ k operations leaves at
    * least one segment untouched, and insertions/deletions shift its
    * position by at most k — so every true pair shares (length l,
    * segment i of a) = (a same-length substring of b starting within
    * ±k of segment i's start), where b probes every indexed length
    * within ±k of its own (|edit| ≤ k bounds the length gap).
    * Candidates come from that EQUI-join on (l, i, substring);
    * `levenshtein` (a built-in on BOTH engines — the classical
    * unit-cost DP, bit-identical) verifies exactly. Keys shorter than
    * k+1 chars cannot host k+1 non-empty segments; their partners are
    * at most k chars longer, so the SHORT pass blocks
    * {len ≤ k} × {len ≤ 2k} — a bounded-length bucket join. No recall
    * knob anywhere: missed-pair probability is 0.
    *
    * Scale shape: k+1 index rows and ≤ (2k+1)(k+1)(2k+1) probe rows
    * per doc (tiny constants); the candidate join is a plain string
    * equi-join (hot segments are AQE skew territory, like every
    * blocking scheme); the DP runs only on candidates. The keyed
    * frame checkpoints once for its four consumers (index, probe,
    * short pass, verify re-join); the grids broadcast. One semantics
    * note for crawl scale: keys of only a few characters match almost
    * everything within k edits, so for them the OUTPUT (not just the
    * candidate set) is near-quadratic in the short-key count — an
    * inherent property of the query, which a caller bounds by
    * pre-filtering ultra-short keys if that fan-out is unwanted. */
  def passJoin(docs: DataFrame, keyLen: Int = 24, k: Int = 2)
  : DataFrame = {
    require(k >= 1, s"passJoin needs k >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val (segGrid, probeGrid) = lenGrids(keyLen, k)
    val keyed = docs
      .select(col("doc_id"),
        expr(s"substring(text, 1, $keyLen)").as("key"))
      .filter(length(col("key")) >= 1)
      .withColumn("kl", length(col("key")))
      .localCheckpoint()
    val sg = segGrid.toDF("l", "i", "s", "len")
    val pg = probeGrid.toDF("l", "i", "p", "len")
    val segs = keyed.filter(col("kl") >= k + 1)
      .join(broadcast(sg), col("kl") === col("l"))
      .select(col("doc_id").as("doc_a"), col("i"), col("l"),
        expr("substring(key, s, len)").as("sub"))
    val probeSide = keyed.filter(col("kl") >= k + 1)
      .join(broadcast(pg),
        col("l").between(col("kl") - k, col("kl") + k) &&
          col("p") + col("len") - 1 <= col("kl"))
      .select(col("doc_id").as("doc_b"), col("i"), col("l"),
        expr("substring(key, p, len)").as("sub"))
    val mainCand = segs.join(probeSide, Seq("l", "i", "sub"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val shortA = keyed.filter(col("kl") <= k)
      .select(col("doc_id").as("doc_a"), col("kl").as("la"))
    val shortB = keyed.filter(col("kl") <= 2 * k)
      .select(col("doc_id").as("doc_b"), col("kl").as("lb"))
    val shortCand = shortA.join(shortB,
        col("doc_a") =!= col("doc_b") &&
          abs(col("la") - col("lb")) <= k)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
    val cand = mainCand.unionAll(shortCand).distinct()
    cand
      .join(keyed.select(col("doc_id").as("doc_a"), col("key").as("ka")),
        "doc_a")
      .join(keyed.select(col("doc_id").as("doc_b"), col("key").as("kb")),
        "doc_b")
      .withColumn("edit_dist",
        levenshtein(col("ka"), col("kb")).cast("long"))
      .filter(col("edit_dist") <= k.toLong)
      .select(col("doc_a"), col("doc_b"), col("edit_dist"))
  }

  /** Oracle twin of [[passJoin]]: the identical segment/probe grids,
    * candidate equi-join, and built-in levenshtein verify in DuckDB. */
  def passJoinSql(table: String, keyLen: Int = 24, k: Int = 2): String = {
    val (segGrid, probeGrid) = lenGrids(keyLen, k)
    val segVals = segGrid.map { case (l, i, s, len) =>
      s"($l, $i, $s, $len)" }.mkString(", ")
    val probeVals = probeGrid.map { case (l, i, p, len) =>
      s"($l, $i, $p, $len)" }.mkString(", ")
    s"""WITH keyed AS MATERIALIZED (
          SELECT doc_id, substr(text, 1, $keyLen) AS key,
                 len(substr(text, 1, $keyLen)) AS kl
          FROM $table WHERE len(substr(text, 1, $keyLen)) >= 1),
        sg(l, i, s, len) AS (SELECT * FROM (VALUES $segVals)),
        pg(l, i, p, len) AS (SELECT * FROM (VALUES $probeVals)),
        segs AS (SELECT doc_id AS doc_a, i, l,
            substr(key, s, len) AS sub
          FROM keyed JOIN sg ON kl = l WHERE kl >= ${k + 1}),
        probes AS (SELECT doc_id AS doc_b, i, l,
            substr(key, p, len) AS sub
          FROM keyed JOIN pg ON l BETWEEN kl - $k AND kl + $k
            AND p + len - 1 <= kl
          WHERE kl >= ${k + 1}),
        mainc AS (SELECT doc_a, doc_b
          FROM segs JOIN probes USING (l, i, sub)
          WHERE doc_a < doc_b),
        shortc AS (SELECT least(a.doc_id, b.doc_id) AS doc_a,
            greatest(a.doc_id, b.doc_id) AS doc_b
          FROM keyed a JOIN keyed b
            ON a.doc_id <> b.doc_id AND abs(a.kl - b.kl) <= $k
          WHERE a.kl <= $k AND b.kl <= ${2 * k}),
        cand AS (SELECT DISTINCT doc_a, doc_b FROM
          (SELECT * FROM mainc UNION ALL SELECT * FROM shortc))
        SELECT doc_a, doc_b,
          CAST(levenshtein(a.key, b.key) AS BIGINT) AS edit_dist
        FROM cand
        JOIN keyed a ON a.doc_id = doc_a
        JOIN keyed b ON b.doc_id = doc_b
        WHERE levenshtein(a.key, b.key) <= $k
        ORDER BY doc_a, doc_b"""
  }
}
