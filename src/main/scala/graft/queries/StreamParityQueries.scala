package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Batch twins of the streaming operators (SURVEY.md §2.11 "streaming
  * windows"): tumbling/sliding windows and session windows over `events`.
  *
  * Value aggregates are emitted as round(sum, 2), NOT averages:
  * events.value has ≤2 decimals so the 2-dp-rounded sum is bit-identical
  * across engines regardless of accumulation order, while any divided
  * average can land exactly on a rounding boundary where Spark's
  * BigDecimal HALF_UP and DuckDB's float rounding disagree (observed on
  * 3/1400 sliding-window rows). Average capability is exercised by the
  * relational queries; here the stable sum is the contract.
  * `window`/`session_window` are the same Catalyst operators Structured
  * Streaming uses incrementally — running them on a batch DataFrame gives
  * the oracle-checkable semantics; graft.streaming wires the identical
  * expressions onto readStream sources.
  */
object StreamParityQueries {

  val defs: Seq[QueryDef] = Seq(

    // Tumbling 1-hour windows per event_type: epoch-aligned, same as
    // DuckDB's date_trunc. One shuffle on (window, event_type).
    QueryDef("stream_tumbling_counts",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"),
          max(col("value")).as("max_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"), col("max_value")),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             | count(*) AS n_events, round(sum(value), 2) AS sum_value,
             | max(value) AS max_value
             | FROM events GROUP BY 1, 2
             | ORDER BY window_start, event_type""".stripMargin.replace("\n", "")),
      presentOrder = Seq("window_start", "event_type")),

    // Sliding 2-hour windows advancing hourly: every event lands in two
    // windows; the oracle unnests the two containing window starts.
    QueryDef("stream_sliding_counts",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("window_start"), col("n_events"), col("sum_value")),
      Some("""WITH x AS (SELECT value,
             |  unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR, date_trunc('hour', ts)]) AS window_start
             |  FROM events)
             | SELECT window_start, count(*) AS n_events,
             |  round(sum(value), 2) AS sum_value
             | FROM x GROUP BY window_start ORDER BY window_start""".stripMargin.replace("\n", "")),
      presentOrder = Seq("window_start")),

    // Session windows (60-minute inactivity gap) per user. The DuckDB twin
    // is the classic gaps-and-islands rewrite; Spark's session end is
    // last_event + gap, reproduced on the oracle side.
    QueryDef("stream_session_windows",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "60 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"), col("sum_value")),
      Some("""WITH g AS (
             |  SELECT user_id, ts, value,
             |   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |        >= INTERVAL 60 MINUTE THEN 1 ELSE 0 END AS new_session
             |  FROM events),
             | i AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g)
             | SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 60 MINUTE AS session_end,
             |  count(*) AS n_events, round(sum(value), 2) AS sum_value
             | FROM i GROUP BY user_id, session_id
             | ORDER BY user_id, session_start""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id", "session_start")),

    // Batch twin of the watermark-bounded stream-stream join
    // (StreamingSpec "stream-stream interval join"): each event enriched
    // with same-user alert events (value >= 200) from the preceding 10
    // minutes. The join condition is exactly the shape Structured
    // Streaming requires to bound state — equi-key plus a two-sided
    // event-time range — so with a watermark >= the range the streaming
    // run emits these same rows. Plans as an equi-join on user_id with
    // the time range as a join filter; per-key fan-out bounded by alert
    // density, no cross product.
    QueryDef("stream_interval_join",
      (s, d) => {
        val e = Tables.events(s, d)
        val alerts = e.filter(col("value") >= 200)
          .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
            col("event_id").as("alert_id"))
        e.join(alerts,
            col("user_id") === col("a_user") &&
              col("a_ts") >= col("ts") - expr("INTERVAL 10 MINUTES") &&
              col("a_ts") <= col("ts"))
          .filter(col("event_id") =!= col("alert_id"))
          .select(col("event_id"), col("alert_id"), col("user_id"),
            (col("ts").cast("long") - col("a_ts").cast("long"))
              .as("lag_seconds"))
      },
      Some("""SELECT e.event_id, a.event_id AS alert_id, e.user_id,
             | CAST(floor(epoch(e.ts)) - floor(epoch(a.ts)) AS BIGINT) AS lag_seconds
             | FROM events e JOIN events a ON a.user_id = e.user_id
             |  AND a.value >= 200 AND a.ts <= e.ts
             |  AND a.ts >= e.ts - INTERVAL 10 MINUTE
             | WHERE e.event_id <> a.event_id
             | ORDER BY e.event_id, a.event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id", "alert_id")),

    // Batch twin of bounded-state streaming dedup over an event-time
    // horizon (dropDuplicatesWithinWatermark class, EgvStreams
    // deduplicate): an event is a duplicate if the previous event with
    // the same (user_id, event_type) lies within 30 minutes; only
    // horizon-separated occurrences survive. One window shuffle on the
    // dedup key; a streaming runner holds one timestamp per key (bounded
    // state, evicted by watermark).
    // Batch twin of StatefulOps.streamingSpanDedup's emission: each
    // non-canonical duplicated window with the canonical site it
    // duplicates — gating the attribution (min (doc_id, pos) per window
    // text) that dedup_span_rewrite's removal-count union cannot see.
    // The streaming op reproduces exactly these rows under its
    // id-ordered arrival contract (parity proven in StreamingSpec).
    QueryDef("stream_span_marks",
      (s, d) => graft.ops.DedupOps.spanMarks(
        Tables.documents(s, d), "text", "doc_id"),
      Some(graft.ops.DedupOps.spanMarksSql("documents", "text", "doc_id")),
      presentOrder = Seq("doc_id", "pos")),

    QueryDef("stream_dedup_horizon",
      (s, d) => {
        val byKey = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("__prev", lag(col("ts"), 1).over(byKey))
          .filter(col("__prev").isNull ||
            col("ts").cast("long") - col("__prev").cast("long") > 1800)
          .select("event_id", "user_id", "event_type", "ts")
      },
      Some("""WITH g AS (SELECT event_id, user_id, event_type, ts,
             |  lag(ts) OVER (PARTITION BY user_id, event_type
             |   ORDER BY ts, event_id) AS prev_ts
             |  FROM events)
             | SELECT event_id, user_id, event_type, ts FROM g
             | WHERE prev_ts IS NULL OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
             | ORDER BY event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id")),

    // CDC changelog classification — the per-update view of a KTable
    // (ref_latest_by_key materializes only the FINAL state; a CDC sink
    // consumes each update's classification): first sight of a
    // (user, event_type) key is 'added', a repeat of the held value
    // 'unchanged', a new value 'changed'. One key-partitioned lag
    // window; raw-double equality (same stored values both engines,
    // nothing recomputed). Streaming twin: StatefulOps
    // .streamingCdcClassify, row-equal across micro-batch splits
    // (StreamingSpec).
    QueryDef("stream_cdc_classify",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("__pv", lag(col("value"), 1).over(w))
          .select(col("event_id"), col("user_id"), col("event_type"),
            when(col("__pv").isNull, "added")
              .when(col("__pv") === col("value"), "unchanged")
              .otherwise("changed").as("status"))
      },
      Some("""WITH g AS (SELECT event_id, user_id, event_type, value,
             |  lag(value) OVER (PARTITION BY user_id, event_type
             |   ORDER BY ts, event_id) AS pv
             |  FROM events)
             | SELECT event_id, user_id, event_type,
             |  CASE WHEN pv IS NULL THEN 'added'
             |       WHEN pv = value THEN 'unchanged'
             |       ELSE 'changed' END AS status
             | FROM g ORDER BY event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id")),

    // Batch twin of StatefulOps.streamingKAnon — the LIVE rung of the
    // privacy ladder (pipeline_k_anonymity audits a closed corpus; a
    // live publisher must suppress-until-k): per level-0 QI class
    // (source|lang|1k-char band) in doc_id arrival order, the first
    // k−1 records are held and released together by the k-th arrival
    // (released_by = that doc); later members publish immediately
    // (released_by = self); classes never reaching k emit nothing.
    // Shape: one QI-keyed window pair, output bounded by published
    // docs. The streaming op reproduces exactly these rows across
    // micro-batch splits of an id-ordered feed (StreamingSpec parity);
    // its state is at most k−1 ids + a flag per class — O(classes·k),
    // corpus-size-free.
    // Batch twin of StatefulOps.streamingGeoDp — PRIVATE CONTINUAL
    // counting with a doubling release schedule: a live publisher
    // releases a category's noisy count only when it crosses a power
    // of two (O(log n) releases bound the privacy loss; per-release
    // noise is the truncated geometric mechanism, the central-DP rung
    // of pipeline_geometric_dp). The coin is hash64(qi#n), so every
    // release is idempotent under replay and batch/stream agree
    // row-for-row (StreamingSpec parity). Shape: one QI-keyed
    // row_number window, a power-of-two bit filter, narrow noise
    // arithmetic — output O(categories · log n).
    QueryDef("stream_geo_dp",
      (s, d) => {
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qi")).orderBy(col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang").as("qi"))
          .withColumn("rn", row_number().over(wOrd).cast("long"))
          .filter(expr("(rn & (rn - 1)) = 0"))
          .withColumn("u", pmod(graft.ops.TextOps.hash64(
            concat(col("qi"), lit("#"), col("rn").cast("string"))),
            lit(graft.ops.SampleOps.GeoMod)))
          .select(col("qi"), col("rn").as("true_n"),
            graft.ops.SampleOps.geoNoise(col("u")).as("noise"),
            greatest(col("rn") + graft.ops.SampleOps.geoNoise(col("u")),
              lit(0L)).as("released_n"),
            col("doc_id").as("released_at"))
      },
      Some(s"""WITH r AS (SELECT doc_id, lang AS qi,
             |   CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
             |     AS BIGINT) AS rn
             |  FROM documents),
             | p AS (SELECT qi, rn AS true_n, doc_id AS released_at,
             |   ${graft.ops.TextOps.hash64Sql(
                  "qi || '#' || CAST(rn AS VARCHAR)")}
             |     % ${graft.ops.SampleOps.GeoMod} AS u
             |  FROM r WHERE (rn & (rn - 1)) = 0)
             | SELECT qi, true_n,
             |  CAST(${graft.ops.SampleOps.geoNoiseSql("u")} AS BIGINT)
             |    AS noise,
             |  greatest(true_n + ${graft.ops.SampleOps.geoNoiseSql("u")}, 0)
             |    AS released_n, released_at
             | FROM p ORDER BY qi, true_n""".stripMargin.replace("\n", "")),
      presentOrder = Seq("qi", "true_n")),

    // The binary-tree mechanism (Chan–Shi–Song TISSEC'11 / Dwork et
    // al. STOC'10) — continual private counting at EVERY arrival, the
    // dense counterpart of stream_geo_dp's doubling schedule: the
    // running count t decomposes into its set-bit dyadic nodes (node
    // (b, t>>b) covers 2^b arrivals), each node carries ONE truncated-
    // geometric draw keyed by (qi, b, node-index), and release(t) =
    // t + Σ node noises. Each arrival touches O(log T) nodes total, so
    // per-record privacy loss is log-bounded and the error is
    // O(log^1.5 T) — the classic result. Release depends only on
    // (qi, t), so the live twin (StatefulOps.streamingTreeDp,
    // StreamingSpec parity) is one keyed counter per category —
    // node noises need no storage. Shape: one
    // QI-keyed row_number window, a ≤63-element bit explode, narrow
    // noise arithmetic, (qi, t) hash-agg. All 63 nonneg bit positions
    // are walked (not a 20-bit cap): a capped filter would emit an
    // EMPTY list — explode drops the row entirely — whenever t is a
    // multiple of 2^20, breaking batch/stream parity and releasing an
    // unnoised exact count past 2^20 arrivals. Any t ≥ 1 has a set
    // bit < 63, so the explode never drops a release.
    QueryDef("stream_tree_dp",
      (s, d) => {
        val masks = (0 until 63).map(1L << _)
        val arr = masks.mkString("array(", "L, ", "L)")
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qi")).orderBy(col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang").as("qi"))
          .withColumn("t", row_number().over(wOrd).cast("long"))
          .select(col("qi"), col("t"), explode(expr(
            s"filter(sequence(0, 62), b -> (t div element_at($arr, b + 1)) % 2 = 1)"))
            .as("b"))
          .withColumn("idx", expr(s"t div element_at($arr, b + 1)"))
          .withColumn("u", pmod(graft.ops.TextOps.hash64(
            concat_ws("|", col("qi"), col("b"), col("idx"))),
            lit(graft.ops.SampleOps.GeoMod)))
          .withColumn("noise", graft.ops.SampleOps.geoNoise(col("u")))
          .groupBy(col("qi"), col("t"))
          .agg(count(lit(1)).as("n_nodes"), sum(col("noise")).as("nz"))
          .select(col("qi"), col("t").as("true_n"), col("n_nodes"),
            (col("t") + col("nz")).as("released_n"),
            (abs(col("nz")) <= col("n_nodes") * 10).as("in_bound"))
      },
      Some({
        val arr = (0 until 63).map(1L << _).mkString("[", ", ", "]")
        s"""WITH r AS (SELECT lang AS qi,
             CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
               AS BIGINT) AS t
            FROM documents),
           bx AS (SELECT qi, t,
              unnest(list_filter(range(0, 63),
                b -> (t // ($arr)[b + 1]) % 2 = 1)) AS b
            FROM r),
           nz AS (SELECT qi, t,
              CAST(${graft.ops.SampleOps.geoNoiseSql("u")} AS BIGINT)
                AS noise
            FROM (SELECT qi, t,
                ${graft.ops.TextOps.hash64Sql(
                  "qi || '|' || CAST(b AS VARCHAR) || '|' || " +
                  s"CAST(t // ($arr)[b + 1] AS VARCHAR)")}
                  % ${graft.ops.SampleOps.GeoMod} AS u
              FROM bx))
           SELECT qi, t AS true_n, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(t + sum(noise) AS BIGINT) AS released_n,
             abs(sum(noise)) <= count(*) * 10 AS in_bound
           FROM nz GROUP BY qi, t ORDER BY qi, true_n"""
      }),
      presentOrder = Seq("qi", "true_n")),

    QueryDef("stream_k_anon",
      (s, d) => {
        val k = PipelineQueries.KAnon
        val dc = Tables.documents(s, d).select(col("doc_id"),
          concat_ws("|", col("source"), col("lang"),
            expr("n_chars div 1000")).as("qi"))
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qi")).orderBy(col("doc_id"))
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qi"))
        dc.withColumn("rn", row_number().over(wOrd))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("kth",
            max(when(col("rn") === k, col("doc_id"))).over(wAll))
          .filter(col("n") >= k)
          .select(col("doc_id"), col("qi"),
            when(col("rn") <= k, col("kth")).otherwise(col("doc_id"))
              .as("released_by"))
      },
      Some(s"""WITH dc AS (SELECT doc_id,
             |   source || '|' || lang || '|' || (n_chars // 1000) AS qi
             |  FROM documents),
             | r AS (SELECT doc_id, qi,
             |   row_number() OVER (PARTITION BY qi ORDER BY doc_id) AS rn,
             |   count(*) OVER (PARTITION BY qi) AS n
             |  FROM dc),
             | r2 AS (SELECT *,
             |   max(CASE WHEN rn = ${PipelineQueries.KAnon} THEN doc_id END)
             |     OVER (PARTITION BY qi) AS kth
             |  FROM r)
             | SELECT doc_id, qi,
             |  CASE WHEN rn <= ${PipelineQueries.KAnon} THEN kth
             |       ELSE doc_id END AS released_by
             | FROM r2 WHERE n >= ${PipelineQueries.KAnon}
             | ORDER BY doc_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // The SERVING view of the Stupid-Backoff LM (Brants et al.
    // EMNLP'07): the model is trained on the corpus snapshot
    // (lang='en'), and every doc arriving OUTSIDE that slice is scored
    // statelessly with the live keep/flag decision attached — the
    // CCNet-style quality cut applied at ingest. The live twin
    // (StatefulOps.streamingLmScore, StreamingSpec parity across
    // micro-batch splits) broadcasts the SAME count tables and
    // replays the exact integer backoff ladder per trigram; no keyed
    // state, no shuffle, replays idempotent. sb_score uses the -1.0
    // no-trigram sentinel (never NULL - the cross-engine NULL-order
    // rule).
    QueryDef("stream_lm_score",
      (s, d) => graft.ops.TextOps.stupidBackoffServe(
        Tables.documents(s, d), col("lang") === "en"),
      Some(graft.ops.TextOps.stupidBackoffServeSql(
        "documents", "lang = 'en'")),
      presentOrder = Seq("doc_id")),

    // The SERVING view of the interpolated Kneser–Ney bigram LM — the
    // smoothing that beats Stupid Backoff on accuracy (Chen & Goodman
    // 1999) served in the same Brants broadcast shape: the model
    // trains on the corpus snapshot (lang='en'), every doc arriving
    // OUTSIDE that slice is scored statelessly with the live
    // keep/flag decision attached. The live twin
    // (StatefulOps.streamingKnScore, StreamingSpec parity across
    // micro-batch splits) broadcasts the SAME count tables (bigram
    // counts, context totals + distinct continuations, pre-floored
    // continuation probabilities) and replays the exact integer
    // interpolation ladder per bigram; no keyed state, no shuffle,
    // replays idempotent. kn_score uses the -1.0 no-bigram sentinel
    // (never NULL — the cross-engine NULL-order rule).
    QueryDef("stream_kn_score",
      (s, d) => graft.ops.TextOps.knServe(
        Tables.documents(s, d), col("lang") === "en"),
      Some(graft.ops.TextOps.knServeSql("documents", "lang = 'en'")),
      presentOrder = Seq("doc_id"))
      ,

    // Tokenizer SERVING view: WordPiece vocab FROZEN on the train slice
    // (lang = 'en'), the complement tokenized against it — the
    // train-then-serve composition a deployed tokenizer runs (and the
    // honest drift surface: serve-slice languages the vocab never saw
    // segment into singles/[UNK]). Streaming twin: the ≤~120-piece
    // vocab broadcasts once and arriving docs tokenize statelessly in
    // a narrow map (StreamingSpec pins row parity across micro-batch
    // splits against this gate — an independent JVM max-munch vs the
    // batch HOF fold).
    QueryDef("stream_wordpiece",
      (s, d) => graft.ops.TextOps.wordPieceServe(
        Tables.documents(s, d), col("lang") === "en"),
      Some(graft.ops.TextOps.wordPieceServeSql("documents", "lang = 'en'")),
      presentOrder = Seq("doc_id"))
  )
}
