package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ops.TextOps

/** Corpus-hygiene surface over `documents`: PII redaction and the
  * Gopher/C4-class composite quality filter. Both are pure narrow maps —
  * zero shuffles, codegen'd regex/when-chains, trivially scale-free —
  * and both share every pattern/threshold constant between the Spark
  * plan and the DuckDB oracle so they cannot drift.
  */
object QualityQueries {

  /** Redaction order is part of the semantics (emails first so the IP
    * pattern can never fire inside a domain): email → phone → IPv4. */
  private val Email = TextOps.EmailRe
  private val Phone = TextOps.PhoneRe
  private val Ip    = TextOps.Ipv4Re

  // Gopher-style rule thresholds (first failing rule names the reason).
  private val MinWords = 30
  private val MaxWords = 100000
  private val MinMeanWordLen = 3.0
  private val MaxMeanWordLen = 5.0
  private val MinStopRatio = 0.02
  private val MaxTokenLen = 20

  private val stopList = TextOps.stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Linear quality-classifier weights (micro-unit feature space, BIGINT
    * margin). Fixed constants = an offline-trained model's artifact; the
    * engine's job is serving it at corpus scale, not training it. Signs:
    * length (capped) and stopword density indicate prose; duplicate-token
    * fraction penalizes boilerplate; mean word length is penalized by
    * distance from the English-prose ideal (~4 chars). */
  private val ClfCapTokens = 256L  // length feature saturates here
  private val ClfBias      = 1000000L
  private val ClfWTokens   = 3000L
  private val ClfWStop     = 2L
  private val ClfWDup      = -2L
  private val ClfAwlIdeal  = 4000000L // 4.0 chars in micro-units
  private val ClfAwlDiv    = 4L

  val defs: Seq[QueryDef] = Seq(

    // PII redaction: count then scrub emails / phone numbers / IPv4s.
    // The corpus is synthetic word-salad, so the PII is composed
    // deterministically from table columns (doc_id) — the gate exercises
    // real matches, overlapping-pattern ordering, AND the zero-match path
    // (docs where no branch fires). Counts are taken pre-redaction; the
    // output carries an md5 of the redacted text so the oracle pins every
    // replacement byte without shipping the full text through the gate.
    QueryDef("text_pii_redact",
      (s, d) => {
        val id = col("doc_id")
        val base = concat(
          col("text"),
          when(pmod(id, lit(2)) === 0,
            concat(lit(" contact user"), id.cast("string"), lit("@example.com")))
            .otherwise(lit("")),
          when(pmod(id, lit(3)) === 0,
            concat(lit(" call +1-555-"),
              lpad(pmod(id * 7919, lit(10000)).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(pmod(id, lit(5)) === 0,
            concat(lit(" from "), pmod(id, lit(256)).cast("string"), lit(".0."),
              pmod(id * 3, lit(256)).cast("string"), lit("."),
              pmod(id, lit(100)).cast("string")))
            .otherwise(lit("")))
        Tables.documents(s, d)
          .withColumn("__t", base)
          .withColumn("__r",
            regexp_replace(
              regexp_replace(
                regexp_replace(col("__t"), Email, "<EMAIL>"),
                Phone, "<PHONE>"),
              Ip, "<IP>"))
          .select(id,
            size(regexp_extract_all(col("__t"), lit(Email), lit(0))).as("n_emails"),
            size(regexp_extract_all(col("__t"), lit(Phone), lit(0))).as("n_phones"),
            size(regexp_extract_all(col("__t"), lit(Ip), lit(0))).as("n_ips"),
            length(col("__r")).as("redacted_len"),
            md5(col("__r")).as("redacted_md5"))
      },
      Some(s"""WITH base AS (SELECT doc_id, text
              |  || CASE WHEN doc_id % 2 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
              |  || CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id * 7919 % 10000 AS VARCHAR), 4, '0') ELSE '' END
              |  || CASE WHEN doc_id % 5 = 0 THEN ' from ' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id * 3 % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
              |  AS t FROM documents),
              | red AS (SELECT doc_id, t,
              |  regexp_replace(regexp_replace(regexp_replace(t,
              |    '$Email', '<EMAIL>', 'g'),
              |    '$Phone', '<PHONE>', 'g'),
              |    '$Ip', '<IP>', 'g') AS r FROM base)
              | SELECT doc_id,
              |  CAST(len(regexp_extract_all(t, '$Email')) AS INT) AS n_emails,
              |  CAST(len(regexp_extract_all(t, '$Phone')) AS INT) AS n_phones,
              |  CAST(len(regexp_extract_all(t, '$Ip')) AS INT) AS n_ips,
              |  CAST(len(r) AS INT) AS redacted_len,
              |  md5(r) AS redacted_md5
              | FROM red ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // Text normalization — the canonicalization pass that precedes every
    // hash-based dedup in a real pipeline: lowercase, strip punctuation
    // to spaces, collapse whitespace runs, trim. The gate pins the full
    // normalized bytes via md5 plus the char-count delta, so any drift
    // in the normalization rules (or engine regex semantics) fails loud.
    QueryDef("text_normalize",
      (s, d) => {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " "))
        Tables.documents(s, d)
          .select(col("doc_id"),
            length(col("text")).as("raw_chars"),
            length(norm).as("norm_chars"),
            md5(norm).as("norm_md5"))
      },
      Some("""SELECT doc_id, CAST(len(text) AS INT) AS raw_chars,
             | CAST(len(trim(regexp_replace(regexp_replace(lower(text),
             |   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS INT) AS norm_chars,
             | md5(trim(regexp_replace(regexp_replace(lower(text),
             |   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5
             | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // Language-ID with a confidence score: marker votes per language,
    // argmax with declaration-order tie-break (same rule as
    // text_lang_predict), plus the rational vote share best/total —
    // integer-derived IEEE division, no softmax/exp, so both engines
    // agree bit-for-bit. Zero-vote docs report 'und' at confidence 0.
    QueryDef("text_lang_confidence",
      (s, d) => {
        var df = Tables.documents(s, d)
          .withColumn("__toks", TextOps.tokens(col("text")))
        for ((l, words) <- TextOps.langMarkers)
          df = df.withColumn(s"__s_$l", TextOps.markerCountExpr("__toks", words))
        val scores = TextOps.langMarkers.map { case (l, _) => col(s"__s_$l") }
        val total = scores.reduce(_ + _)
        val best = greatest(scores: _*)
        val pred = TextOps.langMarkers.foldRight(lit("und")) { case ((l, _), acc) =>
          when(col(s"__s_$l") === best && best > 0, l).otherwise(acc)
        }
        df.select(col("doc_id"), pred.as("predicted"),
          total.cast("long").as("n_votes"),
          when(total > 0,
            round(best.cast("double") / total, 4)
              .cast("decimal(18,4)").cast("double"))
            .otherwise(0.0).as("confidence"))
      },
      Some {
        val scoreCols = TextOps.langMarkers.map { case (l, words) =>
          s"${TextOps.markerCountSql("toks", words)} AS s_$l"
        }.mkString(", ")
        val names = TextOps.langMarkers.map { case (l, _) => s"s_$l" }
        val total = names.mkString(" + ")
        val best = names.mkString("greatest(", ", ", ")")
        val pred = TextOps.langMarkers.reverse.foldLeft("'und'") {
          case (acc, (l, _)) => s"CASE WHEN s_$l = b AND b > 0 THEN '$l' ELSE $acc END"
        }
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            sc AS (SELECT doc_id, $scoreCols FROM t),
            p AS (SELECT *, $best AS b, CAST(($total) AS BIGINT) AS tot FROM sc)
            SELECT doc_id, $pred AS predicted, tot AS n_votes,
              CASE WHEN tot > 0 THEN
                CAST(CAST(round(b::DOUBLE / tot, 4) AS DECIMAL(18,4)) AS DOUBLE)
              ELSE 0.0 END AS confidence
            FROM p ORDER BY doc_id"""
      },
      presentOrder = Seq("doc_id")),

    // Gopher/C4-class composite quality filter: word-count bounds, mean
    // word length bounds, minimum stopword ratio, maximum token length.
    // keep = all rules pass; fail_reason = FIRST failing rule in a fixed
    // order (the reported-reason convention quality pipelines use for
    // rejection stats). Ratio comparisons run on the raw IEEE quotients
    // (bit-identical in both engines); rounding happens only at output.
    QueryDef("text_gopher_rules",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("__toks", TextOps.tokens(col("text")))
          .withColumn("n_words", size(col("__toks")))
          .withColumn("__mwl",
            (col("n_chars") - col("n_words") + 1).cast("double") / col("n_words"))
          .withColumn("__sr",
            TextOps.markerCountExpr("__toks", TextOps.stopwords).cast("double") /
              col("n_words"))
          .withColumn("max_token_len",
            expr("array_max(transform(__toks, t -> length(t)))"))
        docs.select(
          col("doc_id"), col("n_words"),
          round(col("__mwl"), 4).cast("decimal(18,4)").cast("double").as("mean_word_len"),
          round(col("__sr"), 4).cast("decimal(18,4)").cast("double").as("stop_ratio"),
          col("max_token_len"),
          (col("n_words").between(MinWords, MaxWords) &&
            col("__mwl") >= MinMeanWordLen && col("__mwl") <= MaxMeanWordLen &&
            col("__sr") >= MinStopRatio &&
            col("max_token_len") <= MaxTokenLen).as("keep"),
          when(!col("n_words").between(MinWords, MaxWords), "word_count")
            .when(col("__mwl") < MinMeanWordLen || col("__mwl") > MaxMeanWordLen,
              "word_len")
            .when(col("__sr") < MinStopRatio, "stopwords")
            .when(col("max_token_len") > MaxTokenLen, "long_token")
            .as("fail_reason"))
      },
      Some(s"""WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
              | m AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_words,
              |  (n_chars - len(toks) + 1)::DOUBLE / len(toks) AS mwl,
              |  len(list_filter(toks, t -> t IN $stopList))::DOUBLE / len(toks) AS sr,
              |  CAST(list_max(list_transform(toks, t -> len(t))) AS INT) AS max_token_len
              |  FROM t)
              | SELECT doc_id, n_words,
              |  CAST(round(mwl, 4) AS DECIMAL(18,4))::DOUBLE AS mean_word_len,
              |  CAST(round(sr, 4) AS DECIMAL(18,4))::DOUBLE AS stop_ratio,
              |  max_token_len,
              |  (n_words BETWEEN $MinWords AND $MaxWords
              |   AND mwl >= $MinMeanWordLen AND mwl <= $MaxMeanWordLen
              |   AND sr >= $MinStopRatio AND max_token_len <= $MaxTokenLen) AS keep,
              |  CASE WHEN n_words NOT BETWEEN $MinWords AND $MaxWords THEN 'word_count'
              |       WHEN mwl < $MinMeanWordLen OR mwl > $MaxMeanWordLen THEN 'word_len'
              |       WHEN sr < $MinStopRatio THEN 'stopwords'
              |       WHEN max_token_len > $MaxTokenLen THEN 'long_token'
              |  END AS fail_reason
              | FROM m ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id"))
,
    // Model-based quality filtering (the FineWeb-edu / DCLM-classifier
    // step): a linear classifier applied at corpus scale. The weights are
    // FIXED constants standing in for an offline-trained model — serving
    // the model over 100 TB is the engine's job; training it is not.
    // Every feature is integer-exact (integral division to micro-units),
    // the margin is one BIGINT dot product of literals — a pure narrow
    // codegen'd map, no weight table to broadcast, no shuffle, and a
    // hash-exact gate (no float columns at all).
    QueryDef("text_quality_classifier",
      (s, d) => Tables.documents(s, d)
        .withColumn("__toks", TextOps.tokens(col("text")))
        .withColumn("n_tokens", size(col("__toks")).cast("long"))
        .withColumn("__cap", least(col("n_tokens"), lit(ClfCapTokens)))
        .withColumn("stop_micro",
          expr(s"(CAST(${"size(filter(__toks, t -> t IN " +
            stopList + "))"} AS BIGINT) * 1000000) div n_tokens"))
        .withColumn("dup_micro", expr(
          "((n_tokens - size(array_distinct(__toks))) * 1000000) div n_tokens"))
        .withColumn("awl_micro", expr(
          "((CAST(n_chars AS BIGINT) - n_tokens + 1) * 1000000) div n_tokens"))
        .withColumn("margin_micro", expr(
          s"CAST($ClfBias + $ClfWTokens * __cap + $ClfWStop * stop_micro" +
            s" + $ClfWDup * dup_micro" +
            s" - (abs(awl_micro - $ClfAwlIdeal) div $ClfAwlDiv) AS BIGINT)"))
        .select(col("doc_id"), col("n_tokens"), col("stop_micro"),
          col("dup_micro"), col("awl_micro"), col("margin_micro"),
          (col("margin_micro") >= 0L).as("keep")),
      Some(s"""WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
              | f AS (SELECT doc_id,
              |  CAST(len(toks) AS BIGINT) AS n_tokens,
              |  least(CAST(len(toks) AS BIGINT), $ClfCapTokens) AS cap,
              |  (CAST(len(list_filter(toks, t -> t IN $stopList)) AS BIGINT) * 1000000) // len(toks) AS stop_micro,
              |  ((CAST(len(toks) AS BIGINT) - len(list_distinct(toks))) * 1000000) // len(toks) AS dup_micro,
              |  ((CAST(n_chars AS BIGINT) - len(toks) + 1) * 1000000) // len(toks) AS awl_micro
              |  FROM t)
              | SELECT doc_id, n_tokens, stop_micro, dup_micro, awl_micro,
              |  CAST($ClfBias + $ClfWTokens * cap + $ClfWStop * stop_micro
              |   + $ClfWDup * dup_micro
              |   - abs(awl_micro - $ClfAwlIdeal) // $ClfAwlDiv AS BIGINT) AS margin_micro,
              |  ($ClfBias + $ClfWTokens * cap + $ClfWStop * stop_micro
              |   + $ClfWDup * dup_micro
              |   - abs(awl_micro - $ClfAwlIdeal) // $ClfAwlDiv) >= 0 AS keep
              | FROM f ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id"))
  )
}
