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
      presentOrder = Seq("o_orderkey"))
  )
}
