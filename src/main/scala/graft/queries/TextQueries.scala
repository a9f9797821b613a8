package graft.queries


import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ops.TextOps

/** Text-analysis surface over `documents` (north star): token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  * Oracle twins are generated from the same constants as the Spark plans
  * (TextOps) so thresholds/word-lists cannot drift.
  */
object TextQueries {

  private val stop = TextOps.stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  val defs: Seq[QueryDef] = Seq(

    // Token statistics per language: one hash-agg pass, map-side combine.
    QueryDef("text_token_stats",
      (s, d) => Tables.documents(s, d)
        .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          // Quantize-then-DOUBLE rounded averages: the DECIMAL(18,4) cast
          // pins the exact 4dp value both engines agree on (a rounded DOUBLE
          // quotient can differ in the last ulp), and the final DOUBLE cast
          // restores the rendering the driver's hash canonicalizes
          // consistently (DECIMAL output renders "25.0000" vs the oracle's
          // "25.0" and fails the hash despite bit-identical values).
          round(avg(col("n_tokens")), 4).cast("decimal(18,4)").cast("double").as("avg_tokens"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens"),
          round(avg(col("n_chars")), 4).cast("decimal(18,4)").cast("double").as("avg_chars")),
      Some("""SELECT lang, count(*) AS n_docs,
             | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
             | CAST(round(avg(len(string_split(text, ' '))), 4) AS DECIMAL(18,4))::DOUBLE AS avg_tokens,
             | CAST(min(len(string_split(text, ' '))) AS INT) AS min_tokens,
             | CAST(max(len(string_split(text, ' '))) AS INT) AS max_tokens,
             | CAST(round(avg(n_chars), 4) AS DECIMAL(18,4))::DOUBLE AS avg_chars
             | FROM documents GROUP BY lang ORDER BY lang""".stripMargin.replace("\n", "")),
      presentOrder = Seq("lang")),

    // Per-document quality scoring: token count, stopword ratio, average
    // token length, and a categorical quality label. Pure narrow map.
    QueryDef("text_quality",
      (s, d) => Tables.documents(s, d)
        .withColumn("__toks", TextOps.tokens(col("text")))
        .withColumn("n_tokens", size(col("__toks")))
        .withColumn("n_stop", TextOps.markerCountExpr("__toks", TextOps.stopwords))
        .withColumn("stop_ratio",
          round(col("n_stop").cast("double") / col("n_tokens"), 4).cast("decimal(18,4)").cast("double"))
        .withColumn("avg_token_len",
          round((col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"), 4)
            .cast("decimal(18,4)").cast("double"))
        .withColumn("quality",
          when(col("n_tokens") >= 20 && col("stop_ratio") <= 0.3, "good")
            .otherwise("low"))
        .select("doc_id", "n_tokens", "n_stop", "stop_ratio", "avg_token_len", "quality"),
      Some(s"""WITH t AS (SELECT doc_id, n_chars,
              |  string_split(text, ' ') AS toks FROM documents),
              | q AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
              |  CAST(len(list_filter(toks, t -> t IN $stop)) AS INT) AS n_stop,
              |  CAST(round(len(list_filter(toks, t -> t IN $stop))::DOUBLE / len(toks), 4) AS DECIMAL(18,4))::DOUBLE AS stop_ratio,
              |  CAST(round((n_chars - len(toks) + 1)::DOUBLE / len(toks), 4) AS DECIMAL(18,4))::DOUBLE AS avg_token_len
              |  FROM t)
              | SELECT doc_id, n_tokens, n_stop, stop_ratio, avg_token_len,
              |  CASE WHEN n_tokens >= 20 AND stop_ratio <= 0.3 THEN 'good' ELSE 'low' END AS quality
              | FROM q ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // Language-ID heuristic: marker-word votes per language, argmax with a
    // fixed language-priority tie-break, reported as a confusion matrix
    // against the labeled lang column.
    QueryDef("text_lang_predict",
      (s, d) => {
        var df = Tables.documents(s, d)
          .withColumn("__toks", TextOps.tokens(col("text")))
        for ((l, words) <- TextOps.langMarkers)
          df = df.withColumn(s"__s_$l", TextOps.markerCountExpr("__toks", words))
        // argmax in declaration order: first language with the max score.
        val scores = TextOps.langMarkers.map { case (l, _) => col(s"__s_$l") }
        val maxScore = greatest(scores: _*)
        val pred = TextOps.langMarkers.foldRight(lit("und")) { case ((l, _), acc) =>
          when(col(s"__s_$l") === maxScore && maxScore > 0, l).otherwise(acc)
        }
        df.withColumn("predicted", pred)
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n_docs"))
      },
      Some {
        val scoreCols = TextOps.langMarkers.map { case (l, words) =>
          s"${TextOps.markerCountSql("toks", words)} AS s_$l"
        }.mkString(", ")
        val maxExpr = TextOps.langMarkers.map { case (l, _) => s"s_$l" }
          .mkString("greatest(", ", ", ")")
        // Reversed foldRight: the FIRST declared language with the max
        // score wins, same as the Spark when-chain.
        val predExpr = TextOps.langMarkers.reverse.foldLeft("'und'") {
          case (acc, (l, _)) => s"CASE WHEN s_$l = m AND m > 0 THEN '$l' ELSE $acc END"
        }
        s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
            sc AS (SELECT doc_id, lang, $scoreCols FROM t),
            p AS (SELECT *, $maxExpr AS m FROM sc),
            pr AS (SELECT lang, $predExpr AS predicted FROM p)
            SELECT lang, predicted, count(*) AS n_docs FROM pr
            GROUP BY lang, predicted ORDER BY lang, predicted"""
      },
      presentOrder = Seq("lang", "predicted")),

    // BPE-ish sub-word tokenization: regex pieces (letter runs / digit
    // runs / single punctuation), the pre-merge vocabulary a BPE trainer
    // starts from. Pure narrow map; counts per doc.
    QueryDef("text_bpe_tokens",
      (s, d) => {
        val piece = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
        Tables.documents(s, d)
          .withColumn("__p", regexp_extract_all(col("text"), lit(piece), lit(0)))
          .select(col("doc_id"),
            size(col("__p")).as("n_pieces"),
            expr("size(filter(__p, p -> p rlike '^[A-Za-z]+$'))").as("n_word_pieces"),
            size(array_distinct(col("__p"))).as("n_distinct_pieces"))
      },
      Some("""WITH p AS (SELECT doc_id,
             |  regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS pieces
             |  FROM documents)
             | SELECT doc_id, CAST(len(pieces) AS INT) AS n_pieces,
             |  CAST(len(list_filter(pieces, p -> regexp_matches(p, '^[A-Za-z]+$'))) AS INT) AS n_word_pieces,
             |  CAST(len(list_distinct(pieces)) AS INT) AS n_distinct_pieces
             | FROM p ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // TF-IDF top-3 terms per document: explode → (doc, term) tf with
    // map-side combine → term df → broadcast-scalar N → score → per-doc
    // top-k window. The score is the rational tf·N/df, NOT tf·ln(N/df):
    // integer-derived IEEE division is bit-identical across engines,
    // while libm ln() may differ in the last ulp and flip rounded output
    // (the cross-engine hash hazard). Ties break on term order.
    QueryDef("text_tfidf_topk",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tf = docs
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).cast("double").as("__n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy((col("tf").cast("double") * col("__n") / col("df")).desc,
            col("term"))
        tf.join(df, "term")
          .crossJoin(broadcast(n))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("tf"),
            round(col("tf").cast("double") * col("__n") / col("df"), 4)
              .cast("decimal(18,4)").cast("double").as("tfidf"))
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             | tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
             | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             | scored AS (SELECT doc_id, term, tf,
             |  tf * (SELECT count(*) FROM documents) * 1.0 / df AS score,
             |  CAST(row_number() OVER (PARTITION BY doc_id
             |    ORDER BY tf * (SELECT count(*) FROM documents) * 1.0 / df DESC,
             |    term) AS INT) AS rk
             |  FROM tf JOIN df USING (term))
             | SELECT doc_id, rk, term, tf,
             |  CAST(round(score, 4) AS DECIMAL(18,4))::DOUBLE AS tfidf
             | FROM scored WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id", "rk")),

    // Within-document repetition profile (the Gopher/C4-class quality
    // rule): duplicate-token fraction and top-token share per document.
    // Shape: explode → (doc, term) tf with map-side combine → per-doc
    // roll-up — the shuffle carries one row per DISTINCT (doc, term), not
    // per token, and both aggregations partition by doc_id prefixes so
    // AQE coalesces them. Rounded quotients follow the
    // quantize-then-DOUBLE rule (decimal pins the 4dp value, double
    // restores the hash-stable rendering).
    QueryDef("text_repetition",
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        tf.groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            max(col("tf")).as("top_tf"))
          .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_tf"),
            round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 4)
              .cast("decimal(18,4)").cast("double").as("dup_ratio"),
            round(col("top_tf").cast("double") / col("n_tokens"), 4)
              .cast("decimal(18,4)").cast("double").as("top_share"))
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             | tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2)
             | SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS n_distinct,
             |  CAST(max(tf) AS BIGINT) AS top_tf,
             |  CAST(round(CAST(1 AS DOUBLE) - count(*)::DOUBLE / CAST(sum(tf) AS BIGINT), 4)
             |    AS DECIMAL(18,4))::DOUBLE AS dup_ratio,
             |  CAST(round(max(tf)::DOUBLE / CAST(sum(tf) AS BIGINT), 4)
             |    AS DECIMAL(18,4))::DOUBLE AS top_share
             | FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // Heavy hitters per language via the SpaceSaving sketch: top-5 terms
    // with counts. The sketch shuffles at most `capacity` entries per
    // (group × map partition) — bounded regardless of vocabulary size,
    // unlike the exact GROUP BY term whose shuffle IS the corpus at
    // 100 TB. Capacity 256 >> the 31-term corpus vocabulary, so counts
    // are exact here and the plain-count oracle matches bit-for-bit
    // (the sketch's labeled exactness regime).
    QueryDef("text_top_terms",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("lang"), explode(TextOps.tokens(col("text"))).as("term"))
        toks.groupBy(col("lang"))
          .agg(graft.catalyst.TopKSketch(col("term"), 256).as("entries"))
          .select(col("lang"), posexplode(col("entries")).as(Seq("i", "e")))
          .filter(col("i") < 5)
          .select(col("lang"), (col("i") + 1).cast("int").as("rk"),
            col("e._1").as("term"), col("e._2").as("cnt"))
      },
      Some("""WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             | c AS (SELECT lang, term, count(*) AS cnt FROM t GROUP BY 1, 2),
             | r AS (SELECT lang, term, cnt,
             |  CAST(row_number() OVER (PARTITION BY lang
             |    ORDER BY cnt DESC, term) AS INT) AS rk FROM c)
             | SELECT lang, rk, term, CAST(cnt AS BIGINT) AS cnt
             | FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin.replace("\n", "")),
      presentOrder = Seq("lang", "rk")),

    // Document fingerprinting: min-hash of 3-token shingles (rolling
    // content fingerprint) + a 16-bit SimHash. Bulk shape: shingle and
    // token hashes run post-explode in whole-stage codegen and reduce via
    // hash aggregation — the array-lambda form (md5 inside `transform`)
    // evaluates interpreted and measured ~5 s vs <1 s at sf0.1 under full
    // materialization. Docs with <3 tokens keep n_shingles=0/fp_min=null
    // via the left join.
    QueryDef("text_fingerprint",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sh = graft.ops.DedupOps.shingleInv(docs, "text", "doc_id").distinct()
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("int").as("__n_sh"), min(col("h")).as("fp_min"))
        TextOps.simhashAgg(docs, "text", "doc_id")
          .join(sh, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("__n_sh"), lit(0)).as("n_shingles"),
            col("fp_min"),
            col("simhash16"))
      },
      Some {
        val sh = TextOps.shingleHashesSql("toks")
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
            SELECT doc_id, CAST(len($sh) AS INT) AS n_shingles, list_min($sh) AS fp_min,
                   ${TextOps.simhashSql("toks")} AS simhash16
            FROM t ORDER BY doc_id"""
      },
      presentOrder = Seq("doc_id"))
,
    // Statistical-LM fluency score (CCNet/KenLM-class signal, libm-free):
    // mean corpus conditional probability of each doc's bigrams, in exact
    // integer micro-units end to end — per-bigram probability computed at
    // distinct-bigram scale, one token-scale equi-join, order-free sums.
    QueryDef("text_lm_score",
      (s, d) => TextOps.lmScore(Tables.documents(s, d)),
      Some(TextOps.lmScoreSql("documents")),
      presentOrder = Seq("doc_id"))
,
    // TextRank keyword extraction (Mihalcea & Tarau EMNLP'04): damped
    // PageRank over the word co-occurrence graph (adjacent-token
    // edges, symmetrized, self-loops dropped) — the unsupervised
    // keyword scorer that beats raw frequency because a word matters
    // when it co-occurs with OTHER central words. Reuses the exact-
    // integer pageRank rounds (graph_pagerank's operator) over a
    // vocabulary-bounded graph; top-15 by (mass, word). Stopwords stay
    // in deliberately: they rank high and DEMONSTRATE the centrality
    // signal; a production caller filters its stoplist first.
    QueryDef("text_textrank_keywords",
      (s, d) => {
        val bg = Tables.documents(s, d)
          .select(explode(expr(
            """zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
               slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
               (a, b) -> struct(a AS w1, b AS w2))""")).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .filter(col("w1") =!= col("w2"))
        // localCheckpoint: the symmetrized co-occurrence edge set feeds
        // the degree build, the node derivation, AND every unrolled
        // pageRank round — unmaterialized, the tokenize+zip_with bigram
        // extraction re-executed per consumer (32 corpus scans in the
        // r14 plan; the graph_domain_rank shape at word grain).
        val edges = bg.select(col("w1").as("src"), col("w2").as("dst"))
          .union(bg.select(col("w2").as("src"), col("w1").as("dst")))
          .distinct()
          .localCheckpoint()
        val nodes = edges.select(col("src").as("node_id")).distinct()
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("pagerank").desc, col("node_id"))
        graft.ops.GraphOps.pageRank(nodes, edges)
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 15)
          .select(col("rank"), col("node_id").as("word"),
            col("pagerank").as("pr_micro"))
      },
      Some({
        val edgesSql =
          """SELECT w1 AS src, w2 AS dst FROM bgx
             UNION SELECT w2 AS src, w1 AS dst FROM bgx"""
        val prSql = graft.ops.GraphOps.pageRankSql(
          s"SELECT DISTINCT src AS node_id FROM ($edgesSql)", edgesSql)
        s"""WITH bgx AS (SELECT DISTINCT b.w1 AS w1, b.w2 AS w2 FROM (
              SELECT unnest(list_transform(
                range(1, len(string_split(text, ' '))),
                j -> {'w1': string_split(text, ' ')[j],
                      'w2': string_split(text, ' ')[j + 1]})) AS b
              FROM documents) WHERE b.w1 <> b.w2)
            SELECT * FROM (
              SELECT CAST(row_number() OVER (
                  ORDER BY pagerank DESC, node_id) AS BIGINT) AS rank,
                node_id AS word, pagerank AS pr_micro
              FROM ($prSql))
            WHERE rank <= 15 ORDER BY rank"""
      }),
      presentOrder = Seq("rank")),

    // Trigram Stupid Backoff (Brants et al. EMNLP'07) — the LM score
    // function designed for sharded count tables (no cross-shard
    // normalization), trained on the lang='en' slice and scoring the
    // whole corpus so off-slice docs exercise the full
    // trigram→bigram→unigram→OOV backoff chain. The per-doc backoff-
    // level tallies are the curation signal (fluent-but-shifted vs
    // garbage). Fixed-point micro probabilities; the only double is the
    // final quantized mean.
    QueryDef("text_stupid_backoff",
      (s, d) => TextOps.stupidBackoff(Tables.documents(s, d),
        col("lang") === "en"),
      Some(TextOps.stupidBackoffSql("documents", "lang = 'en'")),
      presentOrder = Seq("doc_id"))
,
    // Interpolated Kneser–Ney bigram LM (Kneser & Ney ICASSP'95, the
    // Chen & Goodman'99 winning form) — the PROPER smoothing next to
    // Stupid Backoff's sharded approximation: absolute discount 0.75
    // with the continuation-probability lower order (N1+ distinct
    // counts — "Francisco" scores low as a novel continuation even
    // though it is frequent). Unseen contexts back off to P_cont;
    // never-continued words are true OOV. Fixed-point micro with
    // DECIMAL(38,0)/HUGEINT products; per-doc level tallies are the
    // curation audit.
    QueryDef("text_kneser_ney",
      (s, d) => TextOps.knBigram(Tables.documents(s, d),
        col("lang") === "en"),
      Some(TextOps.knBigramSql("documents", "lang = 'en'")),
      presentOrder = Seq("doc_id"))
,
    // Good–Turing count-of-counts panel (Good'53 / Gale & Sampson'95):
    // per frequency class r, the class size N_r, raw adjusted count
    // r* = (r+1)N_{r+1}/N_r, and the GT probability mass
    // (r+1)N_{r+1}/N — whose r = 0 row IS the unseen-mass estimate
    // N_1/N, the number every smoothing scheme starts from. Bounded
    // O(√tokens) output rows at any corpus size; fixed-point micro
    // with DECIMAL(38,0)/HUGEINT products.
    QueryDef("text_good_turing",
      (s, d) => TextOps.goodTuring(Tables.documents(s, d)),
      Some(TextOps.goodTuringSql("documents")),
      presentOrder = Seq("r"))
,
    // Vocabulary drift between the indexed slice and the arriving slice
    // (the text twin of sim_dim_drift): total-variation distance over
    // term distributions — KL-free by design so the statistic stays in
    // exact integer arithmetic; the re-train trigger for BPE vocab /
    // stopword / LM-count artifacts under continuous ingestion.
    QueryDef("text_vocab_drift",
      (s, d) => TextOps.vocabDrift(Tables.documents(s, d),
        col("doc_id") % 10 < 8),
      Some(TextOps.vocabDriftSql("documents", "doc_id % 10 < 8"))),

    // Collocation mining — the corpus-linguistics primitive behind
    // multi-word-expression vocab entries and tokenizer merge
    // candidates: adjacent bigrams ranked by LIFT, the log-free PMI
    // analogue c(ab)·N / (c(a)·c(b)) in integer permille (PMI itself is
    // the log of lift, so the RANKING is identical and the libm-free
    // discipline holds — exact on both engines). Bigram and unigram
    // counts are two hash-aggs on the exploded token stream; the
    // unigram table is vocabulary-sized and broadcasts onto the bigram
    // table twice; min-count 5 kills the noise tail BEFORE ranking and
    // the head is a TakeOrdered, not a global sort.
    QueryDef("text_collocations",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .withColumn("__toks", TextOps.tokens(col("text")))
        val big = toks.select(explode(expr(
            """CASE WHEN size(__toks) < 2 THEN CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>)
               ELSE transform(sequence(0, size(__toks) - 2),
                 j -> struct(__toks[j] AS w1, __toks[j+1] AS w2)) END"""))
            .as("b"))
          .select(col("b.w1"), col("b.w2"))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 5)
        val uni = toks.select(explode(col("__toks")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
        val n = toks.select(sum(size(col("__toks"))).cast("long").as("__n"))
        big
          .join(broadcast(uni.select(col("w").as("w1"), col("c").as("__ca"))),
            "w1")
          .join(broadcast(uni.select(col("w").as("w2"), col("c").as("__cb"))),
            "w2")
          .crossJoin(broadcast(n))
          .withColumn("lift_permille",
            expr("c_ab * __n * 1000 div (__ca * __cb)"))
          .orderBy(col("lift_permille").desc, col("w1"), col("w2"))
          .limit(20)
          .select(col("w1"), col("w2"), col("c_ab"), col("lift_permille"))
      },
      Some("""WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
             | big AS (SELECT b.w1, b.w2, CAST(count(*) AS BIGINT) AS c_ab
             |  FROM (SELECT unnest(list_transform(
             |      range(0, greatest(len(tk) - 1, 0)),
             |      j -> struct_pack(w1 := tk[j+1], w2 := tk[j+2]))) AS b
             |    FROM t)
             |  GROUP BY b.w1, b.w2 HAVING count(*) >= 5),
             | uni AS (SELECT unnest(tk) AS w FROM t),
             | uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w),
             | n AS (SELECT CAST(sum(len(tk)) AS BIGINT) AS n FROM t)
             | SELECT w1, w2, c_ab,
             |  c_ab * n * 1000 // (ca.c * cb.c) AS lift_permille
             | FROM big JOIN uc ca ON big.w1 = ca.w
             |   JOIN uc cb ON big.w2 = cb.w CROSS JOIN n
             | ORDER BY lift_permille DESC, w1, w2 LIMIT 20""".stripMargin
        .replace("\n", "")),
      presentOrder = Seq("w1", "w2")),

    // Posting-list delta compression audit — the index-storage
    // engineering number behind text_inverted_index: per term, the
    // docid posting list stored as doc-id GAPS under varint encoding
    // (1 byte < 2^7, 2 < 2^14, 3 < 2^21, else 4 — ids here fit 4), vs
    // the fixed 8-byte raw encoding. Dense terms (small gaps) compress
    // toward 1 byte/posting; rare terms pay full-width first gaps —
    // exactly the tradeoff an index tiering policy reads. Everything is
    // integer CASE arithmetic; the gap window and the per-term roll-up
    // share one term-keyed exchange.
    QueryDef("text_postings_delta",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("term")).orderBy(col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
          .withColumn("gap",
            col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w), lit(0L)))
          .withColumn("vb",
            when(col("gap") < 128L, 1L).when(col("gap") < 16384L, 2L)
              .when(col("gap") < 2097152L, 3L).otherwise(4L))
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df"), sum(col("vb")).as("varint_bytes"))
          .select(col("term"), col("df"), col("varint_bytes"),
            (col("df") * 8L).as("raw_bytes"),
            expr("((df * 8 - varint_bytes) * 1000) div (df * 8)")
              .as("savings_permille"))
      },
      Some("""WITH p AS (SELECT DISTINCT doc_id,
             |   unnest(string_split(text, ' ')) AS term FROM documents),
             | g AS (SELECT term, doc_id,
             |   doc_id - COALESCE(lag(doc_id) OVER (PARTITION BY term
             |     ORDER BY doc_id), 0) AS gap FROM p),
             | v AS (SELECT term, CASE WHEN gap < 128 THEN 1
             |   WHEN gap < 16384 THEN 2 WHEN gap < 2097152 THEN 3
             |   ELSE 4 END AS vb FROM g)
             | SELECT term, CAST(count(*) AS BIGINT) AS df,
             |  CAST(sum(vb) AS BIGINT) AS varint_bytes,
             |  CAST(count(*) AS BIGINT) * 8 AS raw_bytes,
             |  ((CAST(count(*) AS BIGINT) * 8 - CAST(sum(vb) AS BIGINT))
             |    * 1000) // (CAST(count(*) AS BIGINT) * 8)
             |    AS savings_permille
             | FROM v GROUP BY term ORDER BY term""".stripMargin
        .replace("\n", "")),
      presentOrder = Seq("term")),

    // Token Gini diversity — the distribution-shape quality signal the
    // max-share/dup-ratio pair in `text_repetition` cannot see: Gini
    // impurity 1 − Σpᵢ² over the doc's unigram distribution (a doc
    // whose tokens are evenly spread scores high; one dominated by a
    // few tokens scores low even when n_distinct is large). Entirely
    // integer: gini_micro = (N² − Σc²)·10⁶ div N² — no transcendental
    // entropy (ln differs across libms; Σp² is rational), so the gate
    // is hash-exact with zero tolerance. Shape: the same two map-side-
    // combinable hash-aggs as TF — (doc, term) grain then doc grain;
    // per-doc Σc² ≤ N² ≤ 10⁸ at 10⁴-token docs, ×10⁶ fits LONG.
    QueryDef("text_token_gini",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).as("__ss"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          expr("((n_tokens * n_tokens - __ss) * 1000000L)" +
            " div (n_tokens * n_tokens)").as("gini_micro")),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             | c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM t GROUP BY 1, 2),
             | g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |   CAST(count(*) AS BIGINT) AS n_types,
             |   CAST(sum(c * c) AS BIGINT) AS ss FROM c GROUP BY doc_id)
             | SELECT doc_id, n_tokens, n_types,
             |  ((n_tokens * n_tokens - ss) * 1000000)
             |    // (n_tokens * n_tokens) AS gini_micro
             | FROM g ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // Heaps-law vocabulary growth curve — "how fast does the vocab grow
    // as the corpus grows", the ingestion observable that schedules BPE
    // retraining and sizes term dictionaries. New-vocabulary credit per
    // doc = terms whose FIRST occurrence (min doc_id) is that doc; the
    // running totals are computed by SkewOps.prefixSums — the two-level
    // distributed prefix sum (range partitions + partition-local windows
    // + a broadcast offset table) — NOT a global one-reducer window: at
    // 100 TB the curve's doc-grain rows still dwarf a single partition.
    // Checkpointed every 50 doc_ids to keep the gate row count stable.
    QueryDef("text_heaps_law",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = docs.select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("term"))
        val newPerDoc = toks.groupBy(col("term"))
          .agg(min(col("doc_id")).as("doc_id"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("nv"))
        val perDoc = docs
          .select(col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("nt"))
          .join(newPerDoc, Seq("doc_id"), "left")
          .withColumn("nv", coalesce(col("nv"), lit(0L)))
        graft.ops.SkewOps.prefixSums(perDoc, Seq("doc_id"),
            Seq("cum_tokens" -> col("nt"), "vocab_size" -> col("nv")))
          .filter(col("doc_id") % 50 === 0)
          .select(col("doc_id"), col("cum_tokens"), col("vocab_size"))
      },
      Some(s"""WITH tk AS (SELECT doc_id, unnest(${TextOps.tokensSql("text")})
             |   AS term FROM documents),
             | fo AS (SELECT term, min(doc_id) AS fd FROM tk GROUP BY term),
             | nv AS (SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS nv
             |  FROM fo GROUP BY fd),
             | pd AS (SELECT d.doc_id,
             |   CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS nt,
             |   COALESCE(nv, 0) AS nv
             |  FROM documents d LEFT JOIN nv ON d.doc_id = nv.doc_id),
             | c AS (SELECT doc_id, sum(nt) OVER w AS cum_tokens,
             |   sum(nv) OVER w AS vocab_size FROM pd
             |  WINDOW w AS (ORDER BY doc_id))
             | SELECT doc_id, CAST(cum_tokens AS BIGINT) AS cum_tokens,
             |  CAST(vocab_size AS BIGINT) AS vocab_size
             | FROM c WHERE doc_id % 50 = 0
             | ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // Winnowing fingerprint selection (the MOSS algorithm): min-in-window
    // over the k-gram hash stream, rightmost tie — the guaranteed-recall
    // fingerprint (any shared ≥ w+k−1-token run contributes an identical
    // selected hash to both docs) at ~2/(w+1) the k-gram count, where
    // text_fingerprint's single min-hash has no such guarantee. The
    // winner-per-window tie rule is a collision-free BIGINT min encode,
    // no argmin needed; oracle replays the identical windows and encode.
    QueryDef("text_winnowing",
      (s, d) => TextOps.winnowFingerprint(Tables.documents(s, d), w = 4),
      Some(TextOps.winnowFingerprintSql("documents", w = 4)),
      presentOrder = Seq("doc_id")),

    // MOSS pair detection on the winnowing prints: doc pairs sharing
    // >= 3 selected hashes + containment permille. The sf0.01 corpus
    // is bimodal (coincidence <= ~3 shared, planted near-dups 6-37),
    // so the threshold separates; the selection guarantee means a
    // shared >= w+k-1-token run cannot be missed. One hash-grain
    // self-join over the ~5x-thinned print index (df cap is the
    // production knob at crawl scale, as in the LSH index).
    QueryDef("dedup_winnow_pairs",
      (s, d) => TextOps.winnowPairs(Tables.documents(s, d), w = 4,
        minShared = 3),
      Some(TextOps.winnowPairsSql("documents", w = 4, minShared = 3)),
      presentOrder = Seq("doc_a", "doc_b"))
  )
}
