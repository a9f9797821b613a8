package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ops.SampleOps

/** Deterministic-sampling surface over `documents` (training-data
  * subsampling and per-class mixing). Oracle twins are generated from the
  * same salt/rate constants, so the sampled SETS — not just counts — are
  * compared row by row.
  */
object SampleQueries {

  val Salt = "graft-r2"
  /** 20% global subsample. */
  val GlobalRate10k = 2000
  /** Per-language mixing rates (out of 10000): up-weight the rare
    * classes, down-weight the dominant one. */
  val LangRates: Seq[(String, Int)] = Seq(
    "en" -> 1000, "de" -> 5000, "es" -> 5000, "fr" -> 8000, "zh" -> 8000)
  /** Temperature-mix document budget — sized so small domains hit the
    * rate cap (kept whole) while the big one is compressed. */
  val TempTarget = 400L
  /** Fixed per-source quota for the deterministic reservoir. */
  val QuotaPerSource = 5
  /** Per-source TOKEN budget for the token-grain quota — sized so the
    * tiny sf0.001 sources fit whole (utilization gate-visible below 1)
    * while sf0.01/sf0.1 sources genuinely truncate. */
  val TokenBudget = 1000L

  val defs: Seq[QueryDef] = Seq(

    // Global deterministic subsample: the selected doc_ids are a stable
    // function of (salt, doc_id) — identical across partitionings,
    // retries, and engines.
    QueryDef("sample_hash_global",
      (s, d) => SampleOps.hashSample(
          Tables.documents(s, d), "doc_id", GlobalRate10k, Salt)
        .select(col("doc_id"), col("lang"), col("n_chars")),
      Some(s"""SELECT doc_id, lang, n_chars FROM documents
              | WHERE ${SampleOps.sampleBucketSql("doc_id", Salt)} < $GlobalRate10k
              | ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // Stratified class mixing: per-language keep rates via an unrolled
    // when-chain (codegen scalar predicate, no rates-table join). Output
    // is the per-class kept/total mix the pipeline would audit.
    QueryDef("sample_stratified_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val kept = SampleOps.stratifiedSample(
            docs, "doc_id", "lang", LangRates, Salt)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
        docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
          .join(kept, Seq("lang"), "left")
          .select(col("lang"), col("n_total"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      },
      Some {
        val thr = SampleOps.stratifiedThresholdSql("lang", LangRates)
        s"""WITH kept AS (
              SELECT lang, count(*) AS n_kept FROM documents
              WHERE ${SampleOps.sampleBucketSql("doc_id", Salt)} < $thr
              GROUP BY lang),
            total AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang)
            SELECT total.lang, n_total, coalesce(n_kept, 0) AS n_kept
            FROM total LEFT JOIN kept ON total.lang = kept.lang
            ORDER BY total.lang"""
      },
      presentOrder = Seq("lang")),

    // Temperature-based domain mixing (α = 0.5): domains derive from the
    // source id's first digit, which merges src1, src10..src19 into one
    // 11×-sized domain — real skew for the re-weighting to compress. The
    // gate compares the full integer audit row per domain: size, √-units,
    // the derived rate threshold (cap exercised: small domains saturate
    // at 10000), and the docs actually sampled at that rate.
    QueryDef("sample_temperature",
      (s, d) => {
        val domain = substring(col("source"), 4, 1)
        val docs = Tables.documents(s, d)
        val rates = SampleOps.temperatureRates(docs, domain, TempTarget)
        val sampled = SampleOps
          .temperatureSample(docs, domain, "doc_id", TempTarget, Salt, Some(rates))
          .groupBy(col("domain")).agg(count(lit(1)).as("n_sampled"))
        rates.join(sampled, Seq("domain"), "left")
          .select(col("domain"), col("n_docs"), col("s_units"), col("rate10k"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      },
      Some {
        val dom = "substr(source, 4, 1)"
        s"""WITH rates AS (${SampleOps.temperatureRatesSql("documents", dom, TempTarget)}),
            sampled AS (
              SELECT $dom AS domain, count(*) AS n_sampled FROM documents
              JOIN rates ON $dom = rates.domain
              WHERE ${SampleOps.sampleBucketSql("doc_id", Salt)} < rate10k
              GROUP BY 1)
            SELECT rates.domain, n_docs, s_units, CAST(rate10k AS BIGINT) AS rate10k,
                   coalesce(n_sampled, 0) AS n_sampled
            FROM rates LEFT JOIN sampled ON rates.domain = sampled.domain
            ORDER BY rates.domain"""
      },
      presentOrder = Seq("domain")),

    // Fixed-quota per-domain sampling — the deterministic reservoir: each
    // source keeps its N docs with the smallest salted hash. Unlike a
    // rate (sample_hash_global) the output SIZE is exact per domain, and
    // unlike reservoir sampling with RNG state the selection is a pure
    // function of (salt, id) — partition/retry/engine invariant. Window
    // top-N per modest-cardinality domain; a TakeOrdered-per-group shape
    // at extreme per-domain skew.
    QueryDef("sample_quota",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(SampleOps.sampleBucket(col("doc_id"), Salt), col("doc_id"))
        Tables.documents(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= QuotaPerSource)
          .select(col("source"), col("rk"), col("doc_id"))
      },
      Some(s"""SELECT source, rk, doc_id FROM (
              |  SELECT source, doc_id, CAST(row_number() OVER (PARTITION BY source
              |   ORDER BY ${SampleOps.sampleBucketSql("doc_id", Salt)}, doc_id) AS INT) AS rk
              |  FROM documents)
              | WHERE rk <= $QuotaPerSource ORDER BY source, rk""".stripMargin
        .replace("\n", "")),
      presentOrder = Seq("source", "rk")),

    // TOKEN-budget quota (the grain mixtures are actually specified in):
    // each source keeps its salted-hash-ordered prefix of docs while the
    // running token total stays within the budget — a doc that would
    // cross the line is dropped and, per the standard prefix rule, no
    // later (smaller) doc back-fills, keeping the kept set a pure prefix
    // (partition/retry/engine invariant, no RNG state). One source-keyed
    // window (running sum), then a slim per-source roll-up on the same
    // partitioning. Summary output: docs seen/kept, tokens kept, and
    // budget utilization in micro-units.
    QueryDef("sample_token_budget",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(SampleOps.sampleBucket(col("doc_id"), Salt), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        Tables.documents(s, d)
          .withColumn("__tok",
            size(graft.ops.TextOps.tokens(col("text"))).cast("long"))
          .withColumn("__cum", sum(col("__tok")).over(w))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("__cum") <= TokenBudget, 1L).otherwise(0L))
              .as("n_kept"),
            sum(when(col("__cum") <= TokenBudget, col("__tok"))
              .otherwise(0L)).as("tokens_kept"))
          .withColumn("util_micro",
            expr(s"tokens_kept * 1000000L div $TokenBudget"))
      },
      Some(s"""WITH c AS (SELECT source, doc_id,
              |   CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
              |   sum(CAST(len(string_split(text, ' ')) AS BIGINT))
              |     OVER (PARTITION BY source
              |       ORDER BY ${SampleOps.sampleBucketSql("doc_id", Salt)}, doc_id
              |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |  FROM documents)
              | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(CASE WHEN cum <= $TokenBudget THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_kept,
              |  CAST(sum(CASE WHEN cum <= $TokenBudget THEN tok ELSE 0 END)
              |    AS BIGINT) AS tokens_kept,
              |  CAST(sum(CASE WHEN cum <= $TokenBudget THEN tok ELSE 0 END)
              |    AS BIGINT) * 1000000 // $TokenBudget AS util_micro
              | FROM c GROUP BY source ORDER BY source""".stripMargin
        .replace("\n", "")),
      presentOrder = Seq("source")),

    // Priority sampling (Duffield–Lund–Thorup) — weight-proportional
    // without-replacement per-source sample: bottom-k by u/w priority
    // (u from the deterministic hash, w = n_chars), plus each row's
    // Horvitz–Thompson contribution max(w, τ) that sums to an unbiased
    // estimate of the source's TOTAL weight from k rows. IEEE division
    // and int→double rounding are correctly rounded in both engines and
    // distinct hashes forbid ties, so set, ranks, τ, and contributions
    // gate EXACTLY — the libm-free alternative to the u^(1/w)
    // Efraimidis–Spirakis key, whose pow() last-ulp is engine-defined.
    // WindowGroupLimit keeps k+1 rows per group before the exchange.
    QueryDef("sample_priority",
      (s, d) => SampleOps.prioritySample(Tables.documents(s, d),
        "doc_id", "n_chars", "source", "ps1", 8),
      Some(SampleOps.prioritySampleSql("documents",
        "doc_id", "n_chars", "source", "ps1", 8)),
      presentOrder = Seq("source", "rank")),

    // Pareto-frontier (skyline) selection on (token count, type-token
    // ratio): the docs no other doc beats on BOTH length and lexical
    // diversity — multi-objective data selection without baked-in
    // scalarization weights. No global sort, no self-join: a
    // dimension-tiny bucket max table prunes everything dominated from
    // a strictly-higher bucket, then two PER-BUCKET windows finish the
    // same-bucket checks (prune-closure argument in the Scaladoc).
    // Oracle is the definitional NOT EXISTS.
    QueryDef("sample_pareto_front",
      (s, d) => SampleOps.paretoFront(Tables.documents(s, d),
        bucketW = 32),
      Some(SampleOps.paretoFrontSql("documents")),
      presentOrder = Seq("doc_id")),

    // DSIR importance resampling (Xie et al. NeurIPS'23): reweight the
    // raw corpus toward a target domain (here lang='en') by hashed
    // unigram likelihood ratios — the data-selection pass run before
    // pretraining mixes are drawn. Fixed-point fold instead of float
    // log-sums (engine-exact), ratios clipped to [¼×, 4×] (truncated
    // importance sampling), hash-systematic keep decision. One
    // tokenize pass, a 64-row broadcast grid, doc-keyed fold — the
    // shuffle carries ≤ 64 distinct features per doc at any corpus
    // size.
    // Water-filling (max-min fair) token-budget allocation across
    // sources: every domain gets min(demand, level) with the level
    // chosen so half the corpus tokens are consumed exactly (floor
    // remainder documented) — the budget-constrained mix allocator
    // that keeps one giant domain from starving the rest. Closed-form
    // sorted prefix-sum solve, no iteration; windows run over the
    // domain table (bounded by #sources), never corpus rows.
    QueryDef("sample_water_fill",
      (s, d) => SampleOps.waterFill(Tables.documents(s, d)),
      Some(SampleOps.waterFillSql("documents")),
      presentOrder = Seq("source")),

    QueryDef("sample_dsir",
      (s, d) => SampleOps.dsirWeights(Tables.documents(s, d),
        col("lang") === "en"),
      Some(SampleOps.dsirWeightsSql("documents", "lang = 'en'")),
      presentOrder = Seq("doc_id")),

    // Same DSIR pass with the target slice defined over a DIFFERENT
    // column (source, not lang) — pins that the oracle twin projects
    // the full row into its unnest (a lang-only projection would be a
    // silent binder error for any non-lang predicate, the round-8
    // ADVICE item), i.e. the Scala API's arbitrary-Column contract
    // holds on both engines.
    QueryDef("sample_dsir_src",
      (s, d) => SampleOps.dsirWeights(Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4")),
      Some(SampleOps.dsirWeightsSql("documents",
        "source IN ('src0', 'src1', 'src2', 'src3', 'src4')")),
      presentOrder = Seq("doc_id"))
  )
}
