package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Snapshot-maintenance surface: the upsert (MERGE) every incremental
  * ingest pipeline runs — apply a batch of updates + inserts onto a
  * snapshot, latest version wins per key.
  */
object MergeQueries {

  val defs: Seq[QueryDef] = Seq(

    // Latest-wins upsert of a derived update batch (1 in 10 keys changed,
    // a handful of brand-new keys) onto the orders snapshot. The merge is
    // NOT a window sort: rows reduce via max_by(struct(payload), version)
    // — a map-side-combinable aggregation, so the shuffle carries one
    // partially-merged row per key per map partition, the same plan shape
    // as ref_latest_by_key. Updated price is an exact double ×2 (no
    // rounding hazard); version survives into the output so the gate
    // checks WHICH side won every key, not just the payload.
    QueryDef("q_upsert_merge",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val base = orders.select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(0).as("v"))
        val updates = orders.filter(pmod(col("o_orderkey"), lit(10)) === 3)
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
            (col("o_totalprice") * 2).as("o_totalprice"), lit(1).as("v"))
        val inserts = orders.filter(pmod(col("o_orderkey"), lit(1000)) === 7)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), lit(42.0).as("o_totalprice"),
            lit(1).as("v"))
        base.unionAll(updates).unionAll(inserts)
          .groupBy(col("o_orderkey"))
          .agg(max_by(
            struct(col("o_orderstatus"), col("o_totalprice"), col("v")),
            col("v")).as("__m"))
          .select(col("o_orderkey"),
            col("__m.o_orderstatus").as("o_orderstatus"),
            col("__m.o_totalprice").as("o_totalprice"),
            col("__m.v").as("src_version"))
      },
      Some("""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS v
             |  FROM orders),
             | ups AS (SELECT o_orderkey, 'U' AS o_orderstatus,
             |  o_totalprice * 2 AS o_totalprice, 1 AS v
             |  FROM orders WHERE o_orderkey % 10 = 3),
             | ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
             |  'N' AS o_orderstatus, 42.0::DOUBLE AS o_totalprice, 1 AS v
             |  FROM orders WHERE o_orderkey % 1000 = 7),
             | allr AS (SELECT * FROM base UNION ALL SELECT * FROM ups
             |  UNION ALL SELECT * FROM ins),
             | m AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
             |  ORDER BY v DESC) AS rn FROM allr)
             | SELECT o_orderkey, o_orderstatus, o_totalprice, v AS src_version
             | FROM m WHERE rn = 1 ORDER BY o_orderkey""".stripMargin.replace("\n", "")),
      presentOrder = Seq("o_orderkey")),

    // Corpus snapshot diff — the audit every dataset re-release ships:
    // old vs new version of the corpus, each doc classified
    // added / removed / changed / unchanged by CONTENT HASH compare
    // (never by text compare: at 100 TB the hashes are precomputed at
    // write time and the diff join carries 16-byte digests, not
    // documents). The two versions derive deterministically from the
    // one documents table (residue-class membership + a marked text
    // revision), so the oracle sees the identical corpus pair. Shape:
    // one full-outer equi-join on doc_id over slim (id, hash) rows —
    // co-partitioned under bucketed layout, AQE-handled otherwise; the
    // classification is a scalar CASE over the join's null pattern.
    QueryDef("q_snapshot_diff",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val old = docs.filter(col("doc_id") % 11 =!= 5)
          .select(col("doc_id"), md5(col("text")).as("old_hash"))
        val neu = docs.filter(col("doc_id") % 13 =!= 7)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 5 === 0,
                concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text"))).as("new_hash"))
        old.join(neu, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("old_hash"), col("new_hash"),
            when(col("old_hash").isNull, "added")
              .when(col("new_hash").isNull, "removed")
              .when(col("old_hash") =!= col("new_hash"), "changed")
              .otherwise("unchanged").as("status"))
      },
      Some("""WITH old AS (SELECT doc_id, md5(text) AS old_hash
             |  FROM documents WHERE doc_id % 11 <> 5),
             | neu AS (SELECT doc_id,
             |   md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
             |       ELSE text END) AS new_hash
             |  FROM documents WHERE doc_id % 13 <> 7)
             | SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id,
             |  old_hash, new_hash,
             |  CASE WHEN old_hash IS NULL THEN 'added'
             |       WHEN new_hash IS NULL THEN 'removed'
             |       WHEN old_hash <> new_hash THEN 'changed'
             |       ELSE 'unchanged' END AS status
             | FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
             | ORDER BY 1""".stripMargin.replace("\n", "")),
      presentOrder = Seq("doc_id")),

    // Incremental-view maintenance at the aggregate level: the base
    // half of the feed (days <= corpus midpoint) and the arriving delta
    // (days after) are aggregated SEPARATELY to user grain, then the
    // user's final stats come from MERGING the two partial rows —
    // count/sum/min/max each by its merge operator — never by
    // re-scanning base + delta together. The gate proves merge ≡ full
    // recompute: the oracle computes the user stats directly over the
    // whole feed (plus the partial count), so any non-mergeable
    // accumulator or merge-order bug goes red. All integer micro-units.
    // At 100 TB this is the maintenance shape: the base aggregate is a
    // stored table, each delta batch merges in at aggregate grain —
    // O(|delta| + |user grain|) per refresh, not O(|base|).
    QueryDef("q_incremental_rollup",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("CAST(ts AS LONG) div 86400").as("day"),
            expr("CAST(floor(value * 1000000 + 0.5) AS LONG)").as("vm"))
        val mid = ev.agg(
          expr("(min(day) + max(day)) div 2").as("mid"))
        val parts = ev.crossJoin(broadcast(mid))
          .withColumn("part", (col("day") <= col("mid")).cast("int"))
          .groupBy(col("user_id"), col("part"))
          .agg(count(lit(1)).as("n"), sum(col("vm")).as("s"),
            min(col("vm")).as("mn"), max(col("vm")).as("mx"))
        parts.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_partials"),
            sum(col("n")).as("n_readings"),
            sum(col("s")).as("sum_micro"),
            min(col("mn")).as("min_micro"),
            max(col("mx")).as("max_micro"))
      },
      Some("""WITH ev AS (SELECT user_id,
             |  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
             |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
             |  FROM events),
             | m AS (SELECT (min(day) + max(day)) // 2 AS mid FROM ev)
             | SELECT user_id,
             |  CAST(count(DISTINCT CASE WHEN day <= mid THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_partials,
             |  CAST(count(*) AS BIGINT) AS n_readings,
             |  CAST(sum(vm) AS BIGINT) AS sum_micro,
             |  min(vm) AS min_micro, max(vm) AS max_micro
             | FROM ev CROSS JOIN m GROUP BY user_id
             | ORDER BY user_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("user_id"))
  )
}
