package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ops.{DedupOps, SimOps, TextOps}

/** Deduplication surface over `documents` / `embeddings` (north star).
  * The sf data contains planted near-duplicate pairs (trigram Jaccard
  * >= 0.9, cleanly separated from the <0.1 noise floor), so threshold 0.8
  * detects exactly the planted pairs. Oracle twins are generated from the
  * same constants as the Spark plans (DedupOps) so hash pipelines match
  * bit-for-bit.
  */
object DedupQueries {

  val JaccardThreshold = 0.8
  val ContainmentThreshold = 0.9
  val CosineThreshold = 0.45

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: hash-groupBy on md5(text), keep min doc_id.
    QueryDef("dedup_exact",
      (s, d) => DedupOps.exactDedup(Tables.documents(s, d), "text", "doc_id"),
      Some("""SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
             | count(*) AS n_copies FROM documents
             | GROUP BY 1 ORDER BY keep_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("keep_id")),

    // Per-source dedup attribution: after exact dedup, which sources
    // lose how many docs, and how many losses cross source boundaries
    // (licensing/provenance signal) — the curation accounting report.
    // The synthetic corpus has no exact duplicates, so (the pii_redact
    // pattern) the query plants them deterministically on BOTH engines:
    // every doc_id % 7 == 0 is mirrored into a 'scraper' source (those
    // all lose cross-source to the original), and every doc_id % 11 == 0
    // is re-posted within its own source (intra-source losses) — all
    // four report columns carry non-trivial values under the gate.
    QueryDef("dedup_attribution",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val scraped = docs.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id") + lit(1000000000L), lit("scraper"),
            col("text"))
        val reposts = docs.filter(col("doc_id") % 11 === 0)
          .select(col("doc_id") + lit(2000000000L), col("source"),
            col("text"))
        DedupOps.dedupAttribution(docs.unionAll(scraped).unionAll(reposts),
          "text", "doc_id", "source")
      },
      Some(DedupOps.dedupAttributionSql(
        """(SELECT doc_id, source, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000000, 'scraper', text FROM documents
            WHERE doc_id % 7 = 0
            UNION ALL
            SELECT doc_id + 2000000000, source, text FROM documents
            WHERE doc_id % 11 = 0)""",
        "text", "doc_id", "source")),
      presentOrder = Seq("source")),

    // Exact n-gram (3-token shingle) Jaccard near-dup pairs via the
    // inverted-index self-join — no O(n²) cross product.
    QueryDef("dedup_ngram_jaccard",
      (s, d) => DedupOps.jaccardPairs(Tables.documents(s, d), "text", "doc_id",
        JaccardThreshold),
      Some(DedupOps.jaccardPairsSql("documents", "text", "doc_id", JaccardThreshold)),
      presentOrder = Seq("doc_a", "doc_b")),

    // EXACT Jaccard >= 3/5 over word sets via prefix filtering (AllPairs/
    // PPJoin) — the certified-exact arm beside the df-capped shingle
    // index (capped-universe scores) and the probabilistic LSH paths:
    // completeness is a theorem (every qualifying pair shares a
    // rarest-first prefix token), candidates come from the prefix-only
    // inverted index whose tokens are each doc's RAREST, and the whole
    // score algebra is integer (cross-multiplied threshold, permille
    // output) — hash-exact, zero float columns.
    QueryDef("dedup_prefix_filter",
      (s, d) => DedupOps.prefixFilterPairs(Tables.documents(s, d),
        "text", "doc_id"),
      Some(DedupOps.prefixFilterPairsSql("documents", "text", "doc_id")),
      presentOrder = Seq("doc_a", "doc_b")),

    // MinHash(16) + LSH(4 bands × 4 rows) near-dup pairs with exact
    // verification — the 100 TB path (bucket-join instead of shingle-join).
    QueryDef("dedup_minhash_lsh",
      (s, d) => DedupOps.minhashLshPairs(Tables.documents(s, d), "text", "doc_id",
        JaccardThreshold),
      Some(DedupOps.minhashLshPairsSql("documents", "text", "doc_id", JaccardThreshold)),
      presentOrder = Seq("doc_a", "doc_b")),

    // One-Permutation-Hashing MinHash (rotation-densified): the same
    // band/verify machinery as dedup_minhash_lsh but the signature scan
    // evaluates ONE hash per shingle instead of k=16 — the CPU winner
    // at crawl scale, where the signature pass dominates dedup cost.
    QueryDef("dedup_minhash_oph",
      (s, d) => DedupOps.ophLshPairs(Tables.documents(s, d), "text",
        "doc_id", JaccardThreshold),
      Some(DedupOps.ophLshPairsSql("documents", "text", "doc_id",
        JaccardThreshold)),
      presentOrder = Seq("doc_a", "doc_b")),

    // MinHash estimator-accuracy audit: per LSH candidate pair, the
    // signature-agreement estimate vs the exact shingle Jaccard, both
    // integer permille — the quality surface for every consumer that
    // only ever sees signatures (the streaming near-dup twin's
    // verification regime). Oracle recomputes BOTH independently.
    QueryDef("dedup_minhash_accuracy",
      (s, d) => DedupOps.minhashAccuracy(Tables.documents(s, d), "text",
        "doc_id"),
      Some(DedupOps.minhashAccuracySql("documents", "text", "doc_id")),
      presentOrder = Seq("doc_a", "doc_b")),

    // SimHash fingerprint dedup: near-identical docs land on identical
    // 16-bit fingerprints; groups of >1 are dup candidates.
    QueryDef("dedup_simhash",
      (s, d) => TextOps.simhashAgg(Tables.documents(s, d), "text", "doc_id")
        .groupBy(col("simhash16"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"),
          max(col("doc_id")).as("max_id"))
        .filter(col("n_docs") > 1),
      Some {
        val sh = TextOps.simhashSql("string_split(text, ' ')")
        s"""WITH f AS (SELECT doc_id, $sh AS simhash16 FROM documents)
            SELECT simhash16, count(*) AS n_docs, min(doc_id) AS keep_id,
                   max(doc_id) AS max_id
            FROM f GROUP BY simhash16 HAVING count(*) > 1 ORDER BY keep_id"""
      },
      presentOrder = Seq("keep_id")),

    // SimHash near-dup PAIRING: band blocking with pigeonhole-exact
    // recall for hamming <= 3, candidates verified by codegen'd
    // bit_count(xor). Completes the simhash method (fingerprints above,
    // pairs here) beside the MinHash and embedding LSH families.
    QueryDef("dedup_simhash_pairs",
      (s, d) => DedupOps.simhashPairs(Tables.documents(s, d), "text", "doc_id"),
      Some(DedupOps.simhashPairsSql("documents", "text", "doc_id")),
      presentOrder = Seq("doc_a", "doc_b")),

    // Cluster canonicalization over near-dup pairs: connected components
    // (A~B, B~C collapse to one cluster even though (A,C) was never
    // scored) via iterative min-label propagation; cluster = min doc_id.
    // Oracle: recursive-CTE min-label walk over the same pairs.
    // jaccardPairsCached: with `graft.pairs.dir` set the pair table is
    // materialized once and shared with pipeline_corpus_curation (the
    // 100 TB consumption shape); unset it computes inline — same oracle.
    QueryDef("dedup_clusters",
      (s, d) => DedupOps.connectedComponents(
        DedupOps.jaccardPairsCached(Tables.documents(s, d), "text", "doc_id",
          JaccardThreshold)),
      Some(DedupOps.connectedComponentsSql(
        DedupOps.jaccardPairsSql("documents", "text", "doc_id", JaccardThreshold))),
      presentOrder = Seq("doc_id")),

    // Maximal duplicated spans (suffix-dedup semantics): every shared
    // run of >= 12 tokens between a doc pair, found as gaps-and-islands
    // along the (pos_a - pos_b) diagonal of matching 8-token windows —
    // arbitrary-length exact substring dedup with NO suffix array;
    // df-capped window join, work ∝ matched windows. Top-50 report.
    QueryDef("dedup_max_spans",
      (s, d) => DedupOps.maxSpans(Tables.documents(s, d), "text", "doc_id"),
      Some(DedupOps.maxSpansSql("documents", "text", "doc_id")),
      presentOrder = Seq("doc_a", "doc_b", "start_a", "start_b")),

    // Span-removal REWRITE (Lee et al. ExactSubstr applied, not just
    // measured): every duplicated >= 8-token window keeps its globally
    // first occurrence and is stripped everywhere else; the cleaned
    // corpus is re-emitted with per-doc removal stats. One window-hash
    // shuffle (count + first-occurrence rank together), removal rows
    // linear in duplicated occurrences, reconstruction via codegen'd
    // array HOFs — no suffix array, no pair join, no df-cap (the
    // cleaner must strip boilerplate too).
    QueryDef("dedup_span_rewrite",
      (s, d) => DedupOps.spanRewrite(Tables.documents(s, d), "text", "doc_id"),
      Some(DedupOps.spanRewriteSql("documents", "text", "doc_id")),
      presentOrder = Seq("doc_id")),

    // Boilerplate stripping — C4's line-frequency rule at the
    // non-overlapping 8-token block grain: a block occurring in >= 3
    // DISTINCT docs anywhere in the corpus is removed EVERYWHERE
    // (no canonical copy — the opposite keep-rule of span_rewrite's
    // keep-first). Blocks partition each doc, so the occurrence table
    // is 8x smaller than the stride-1 span table, df is one
    // block-hash agg, and reconstruction is one doc-keyed roll-up of
    // the kept blocks in order.
    QueryDef("dedup_boilerplate",
      (s, d) => DedupOps.boilerplateClean(Tables.documents(s, d),
        "text", "doc_id"),
      Some(DedupOps.boilerplateCleanSql("documents", "text", "doc_id")),
      presentOrder = Seq("doc_id")),

    // Incremental span cleaning: the arriving 20% batch loses every
    // >=8-token window already present in the indexed 80% — ONE hash
    // equi-join against the old corpus's DISTINCT window index (cost ∝
    // batch + probe, old×old never rescanned); new-vs-new out of scope
    // by the dedup_incremental contract.
    QueryDef("dedup_span_incremental",
      (s, d) => DedupOps.spanRewriteIncremental(Tables.documents(s, d),
        "text", "doc_id", col("doc_id") % 10 < 8),
      Some(DedupOps.spanRewriteIncrementalSql("documents", "text", "doc_id",
        "doc_id % 10 < 8")),
      presentOrder = Seq("doc_id")),

    // Canonical-representative selection: per near-dup cluster, KEEP the
    // highest-quality member (longest token count, doc_id tie-break) —
    // production near-dedup keeps the best document, not the first-seen
    // one (min-id keeping throws away the better copy whenever the
    // scraper's truncated mirror has the smaller id). Spark picks the rep
    // in the SAME single cluster-keyed shuffle as the member roll-up
    // (partial-aggregable max_by(struct)); the oracle spells the
    // identical choice as a row_number window. Output covers true
    // clusters (docs appearing in a near-dup pair); singletons are
    // vacuously their own representative.
    QueryDef("dedup_cluster_rep",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = docs.select(col("doc_id"),
          size(graft.ops.TextOps.tokens(col("text"))).as("n_tokens"))
        val cc = DedupOps.connectedComponents(
          DedupOps.jaccardPairsCached(docs, "text", "doc_id",
            JaccardThreshold))
        cc.join(toks, "doc_id")
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_members"),
            max_by(col("doc_id"),
              struct(col("n_tokens"), (-col("doc_id")).as("nid")))
              .as("rep_doc"),
            max(col("n_tokens")).as("rep_tokens"))
      },
      Some {
        val ccSql = DedupOps.connectedComponentsSql(
          DedupOps.jaccardPairsSql("documents", "text", "doc_id",
            JaccardThreshold))
        s"""WITH cc AS ($ccSql),
            tk AS (SELECT doc_id, CAST(len(${graft.ops.TextOps
              .tokensSql("text")}) AS INT) AS n_tokens FROM documents),
            m AS (SELECT cluster, cc.doc_id, n_tokens, row_number() OVER (
                    PARTITION BY cluster
                    ORDER BY n_tokens DESC, cc.doc_id) AS rn
                  FROM cc JOIN tk ON cc.doc_id = tk.doc_id)
            SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
                   min(CASE WHEN rn = 1 THEN doc_id END) AS rep_doc,
                   CAST(max(n_tokens) AS INT) AS rep_tokens
            FROM m GROUP BY cluster ORDER BY cluster"""
      },
      presentOrder = Seq("cluster")),

    // Embedding-cosine near-dup pairs. Brute pairing at test SF; the LSH
    // bucketing in SimQueries is the scale path for the same predicate.
    // Guarded: refuses inputs above SimOps.BruteAuditMaxRows so the
    // O(n^2) audit arm can never be pointed at a real corpus by accident.
    QueryDef("dedup_embedding_cosine",
      (s, d) => {
        graft.catalyst.GraftFunctions.register(s)
        val v = SimOps.withNorm(
          SimOps.guardBruteAudit(
            Tables.embeddings(s, d).select("vec_id", "embedding"),
            "dedup_embedding_cosine"), "embedding", "n")
        // The threshold lives IN the join condition, AFTER the id check:
        // Catalyst used to push the score filter in front of the written
        // a<b conjunct, so the 64-dim dot product ran for all n² ordered
        // pairs; with the cheap id test first, && short-circuits and the
        // dot is evaluated for the n²/2 unordered pairs only (the score
        // recompute in the select touches survivors alone).
        val scoreExpr = round(expr("array_dot(a.embedding, b.embedding)") /
          (col("a.n") * col("b.n")), 6)
        v.as("a").join(v.as("b"),
            col("a.vec_id") < col("b.vec_id") &&
              scoreExpr >= CosineThreshold)
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            scoreExpr.as("score"))
          .select(col("vec_a"), col("vec_b"),
            SimOps.quant4(col("score")).as("cosine"))
      },
      Some(s"""SELECT vec_a, vec_b, ${SimOps.quant4Sql("score")} AS cosine FROM (
              | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |  round(${SimOps.cosineSql("a.embedding", "b.embedding")}, 6) AS score
              | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
              | WHERE score >= $CosineThreshold ORDER BY vec_a, vec_b""".stripMargin.replace("\n", "")),
      presentOrder = Seq("vec_a", "vec_b")),

    // SemDeDup (Abbas et al. 2023): the SCALE path for embedding-space
    // dedup — pairwise cosine confined to trained k-means clusters, so
    // candidate pairs are n²/c instead of n² and every stage (capped
    // training, narrow-map assignment, per-cell equi-join) survives a
    // 100 TB corpus. Keep-min-id representative per duplicate edge;
    // the brute dedup_embedding_cosine above is this operator's
    // guarded exactness audit.
    QueryDef("dedup_semantic",
      (s, d) => {
        graft.catalyst.GraftFunctions.register(s)
        SimOps.semDedup(Tables.embeddings(s, d), CosineThreshold,
          c = 8, trainRounds = 2, dim = 64)
      },
      Some(SimOps.semDedupSql("embeddings", CosineThreshold,
        c = 8, trainRounds = 2, dim = 64)),
      presentOrder = Seq("cell", "dropped_id")),

    // Max-containment pairs over the same capped shingle universe:
    // C = common / min(|A|,|B|) catches a short document copied inside a
    // longer one (C≈1, J≈0) — the sub-document duplication case Jaccard
    // misses. Same single-shuffle pair-stats core as dedup_ngram_jaccard.
    QueryDef("dedup_containment",
      (s, d) => DedupOps.containmentPairs(Tables.documents(s, d), "text",
        "doc_id", ContainmentThreshold),
      Some(DedupOps.containmentPairsSql("documents", "text", "doc_id",
        ContainmentThreshold)),
      presentOrder = Seq("doc_a", "doc_b")),

    // Benchmark-contamination check: training docs sharing ≥1 trigram
    // shingle with the (held-out) eval slice, with overlap fraction — the
    // n-gram decontamination report run before shipping training data.
    // The eval predicate filters BEFORE the explode (pruned scan) and the
    // eval shingle set broadcasts; the training side is never shuffled
    // for the membership test.
    QueryDef("dedup_contamination",
      (s, d) => DedupOps.contamination(Tables.documents(s, d), "text",
        "doc_id", col("doc_id") % 50 === 0),
      Some(DedupOps.contaminationSql("documents", "text", "doc_id",
        "doc_id % 50 = 0")),
      presentOrder = Seq("doc_id")),

    // Bloom-filter decontamination audit: the exact eval-shingle-set
    // broadcast of dedup_contamination replaced by one mergeable 8 KiB
    // bitset (BloomSetAgg) — the membership artifact whose size does NOT
    // grow with the eval suite. Audit form keeps the exact twin beside
    // the Bloom count so realized false positives (and the no-false-
    // negative guarantee) are gate-visible; the oracle replays the same
    // bit positions as a position-set test.
    QueryDef("dedup_contamination_bloom",
      (s, d) => DedupOps.contaminationBloomAudit(Tables.documents(s, d),
        "text", "doc_id", col("doc_id") % 50 === 0),
      Some(DedupOps.contaminationBloomAuditSql("documents", "text", "doc_id",
        "doc_id % 50 = 0")),
      presentOrder = Seq("doc_id")),

    // Exact duplicate-SPAN coverage: 8-token windows at every offset;
    // a window occurring >=2 times anywhere in the corpus marks its
    // positions duplicated — the arbitrary-offset substring-dedup
    // semantic the fixed chunk grid can't see. One h-shuffle (window
    // count, no self-join, no pair fan-out), per-doc covered fraction.
    QueryDef("dedup_span_coverage",
      (s, d) => DedupOps.spanCoverage(Tables.documents(s, d), "text", "doc_id"),
      Some(DedupOps.spanCoverageSql("documents", "text", "doc_id")),
      presentOrder = Seq("doc_id")),

    // Incremental dedup: the arriving 20% slice checked against the
    // existing 80% corpus — exact (md5 equi-join) + near (MinHash band
    // buckets, new⋈old only: old×old candidates are never generated,
    // which is the whole incremental advantage at 100 TB).
    QueryDef("dedup_incremental",
      (s, d) => DedupOps.incrementalDedup(Tables.documents(s, d), "text",
        "doc_id", col("doc_id") % 5 === 4, JaccardThreshold),
      Some(DedupOps.incrementalDedupSql("documents", "text", "doc_id",
        c => s"$c % 5 = 4", JaccardThreshold)),
      presentOrder = Seq("doc_id")),

    // Semantic dedup: connected components over the embedding-LSH
    // near-dup pairs (the SemDeDup shape: cosine-similar groups collapse
    // to one canonical representative = min vec_id), composing the
    // 100 TB-path pair generator with the iterative CC operator.
    QueryDef("dedup_semantic_clusters",
      (s, d) => {
        graft.catalyst.GraftFunctions.register(s)
        val pairs = SimOps.cosineLshPairs(
          Tables.embeddings(s, d).select("vec_id", "embedding"),
          CosineThreshold, LshTables)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        DedupOps.connectedComponents(pairs)
          .select(col("doc_id").as("vec_id"), col("cluster"))
      },
      Some {
        val pairsSql = s"""SELECT vec_a AS doc_a, vec_b AS doc_b FROM
          (${SimOps.cosineLshPairsSql("embeddings", CosineThreshold, LshTables)})"""
        s"""SELECT doc_id AS vec_id, cluster FROM
            (${DedupOps.connectedComponentsSql(pairsSql)}) ORDER BY vec_id"""
      },
      presentOrder = Seq("vec_id")),

    // Embedding-cosine near-dup pairs via multi-table hyperplane LSH —
    // the 100 TB path for the same predicate: bucket equi-join (8 tables ×
    // 4 planes = 16 buckets each), exact-cosine verify on candidates only.
    // Recall < 1 vs the brute gate is inherent to LSH; the oracle twin
    // replicates the identical pipeline so results match exactly.
    QueryDef("dedup_embedding_lsh",
      (s, d) => {
        graft.catalyst.GraftFunctions.register(s)
        SimOps.cosineLshPairs(
          Tables.embeddings(s, d).select("vec_id", "embedding"),
          CosineThreshold, LshTables)
      },
      Some(SimOps.cosineLshPairsSql("embeddings", CosineThreshold, LshTables)),
      presentOrder = Seq("vec_a", "vec_b"))
  )

  /** 8 LSH tables × 4 hyperplanes: ~0.8 recall at cosine 0.45 on random
    * 64-dim embeddings, 16 buckets per table bounding candidate fan-out. */
  lazy val LshTables: Seq[Seq[Seq[Double]]] =
    SimOps.lshTables(tables = 8, planes = 4, dim = 64)
}
