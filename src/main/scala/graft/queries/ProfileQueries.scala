package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Data-profiling and validation surface — the ANALYZE/deequ-style
  * audits a pipeline runs before trusting a feed: per-column statistics
  * and a declarative constraint panel. All outputs are integers
  * (micro-units for numerics, epoch-micros for timestamps), so the gate
  * is hash-exact with no float rendering anywhere.
  */
object ProfileQueries {

  val defs: Seq[QueryDef] = Seq(

    // Column profile of lineitem — count / nulls / EXACT distinct /
    // min / max per column, ONE scan: a single aggregate computes every
    // column's stats (Spark plans the multi-distinct via Expand — one
    // pass over the data, the standard shape), then `stack` unpivots
    // the wide row into one row per column. Numeric min/max ship in
    // integer micro-units, the timestamp as epoch-micros, strings as
    // NULL — a uniform BIGINT surface instead of per-type rendering
    // (double-vs-decimal rendering is exactly what the strict gate
    // punishes). At 100 TB this is the same one-pass profile; only
    // n_distinct would move to HLL partials (q_hll_partial_merge).
    QueryDef("q_profile_table",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val a = li.agg(
          count(lit(1)).as("n"),
          count(col("l_orderkey")).as("nn1"),
          count_distinct(col("l_orderkey")).as("nd1"),
          min(col("l_orderkey")).as("mn1"), max(col("l_orderkey")).as("mx1"),
          count(col("l_linenumber")).as("nn2"),
          count_distinct(col("l_linenumber")).as("nd2"),
          min(col("l_linenumber")).as("mn2"),
          max(col("l_linenumber")).as("mx2"),
          count(col("l_quantity")).as("nn3"),
          count_distinct(col("l_quantity")).as("nd3"),
          min(col("l_quantity")).as("mn3"), max(col("l_quantity")).as("mx3"),
          count(col("l_extendedprice")).as("nn4"),
          count_distinct(col("l_extendedprice")).as("nd4"),
          min(col("l_extendedprice")).as("mn4"),
          max(col("l_extendedprice")).as("mx4"),
          count(col("l_returnflag")).as("nn5"),
          count_distinct(col("l_returnflag")).as("nd5"),
          count(col("l_shipdate")).as("nn6"),
          count_distinct(col("l_shipdate")).as("nd6"),
          min(col("l_shipdate")).as("mn6"), max(col("l_shipdate")).as("mx6"))
        a.select(expr(
          """stack(6,
             'l_orderkey', n, n - nn1, nd1, mn1 * 1000000L, mx1 * 1000000L,
             'l_linenumber', n, n - nn2, nd2,
               CAST(mn2 AS LONG) * 1000000L, CAST(mx2 AS LONG) * 1000000L,
             'l_quantity', n, n - nn3, nd3,
               CAST(floor(mn3 * 1000000 + 0.5) AS LONG),
               CAST(floor(mx3 * 1000000 + 0.5) AS LONG),
             'l_extendedprice', n, n - nn4, nd4,
               CAST(floor(mn4 * 1000000 + 0.5) AS LONG),
               CAST(floor(mx4 * 1000000 + 0.5) AS LONG),
             'l_returnflag', n, n - nn5, nd5,
               CAST(NULL AS LONG), CAST(NULL AS LONG),
             'l_shipdate', n, n - nn6, nd6,
               CAST(CAST(mn6 AS TIMESTAMP) AS LONG) * 1000000L,
               CAST(CAST(mx6 AS TIMESTAMP) AS LONG) * 1000000L)
             AS (column_name, n_rows, n_null, n_distinct,
                 min_micro, max_micro)"""))
      },
      Some("""WITH s AS (SELECT
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(l_orderkey) AS BIGINT) AS nn1,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nd1,
             |  min(l_orderkey) AS mn1, max(l_orderkey) AS mx1,
             |  CAST(count(l_linenumber) AS BIGINT) AS nn2,
             |  CAST(count(DISTINCT l_linenumber) AS BIGINT) AS nd2,
             |  min(l_linenumber) AS mn2, max(l_linenumber) AS mx2,
             |  CAST(count(l_quantity) AS BIGINT) AS nn3,
             |  CAST(count(DISTINCT l_quantity) AS BIGINT) AS nd3,
             |  min(l_quantity) AS mn3, max(l_quantity) AS mx3,
             |  CAST(count(l_extendedprice) AS BIGINT) AS nn4,
             |  CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS nd4,
             |  min(l_extendedprice) AS mn4, max(l_extendedprice) AS mx4,
             |  CAST(count(l_returnflag) AS BIGINT) AS nn5,
             |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS nd5,
             |  CAST(count(l_shipdate) AS BIGINT) AS nn6,
             |  CAST(count(DISTINCT l_shipdate) AS BIGINT) AS nd6,
             |  min(l_shipdate) AS mn6, max(l_shipdate) AS mx6
             | FROM lineitem)
             | SELECT * FROM (
             |  SELECT 'l_orderkey' AS column_name, n AS n_rows,
             |   n - nn1 AS n_null, nd1 AS n_distinct,
             |   mn1 * 1000000 AS min_micro, mx1 * 1000000 AS max_micro FROM s
             |  UNION ALL SELECT 'l_linenumber', n, n - nn2, nd2,
             |   CAST(mn2 AS BIGINT) * 1000000, CAST(mx2 AS BIGINT) * 1000000
             |   FROM s
             |  UNION ALL SELECT 'l_quantity', n, n - nn3, nd3,
             |   CAST(floor(mn3 * 1000000 + 0.5) AS BIGINT),
             |   CAST(floor(mx3 * 1000000 + 0.5) AS BIGINT) FROM s
             |  UNION ALL SELECT 'l_extendedprice', n, n - nn4, nd4,
             |   CAST(floor(mn4 * 1000000 + 0.5) AS BIGINT),
             |   CAST(floor(mx4 * 1000000 + 0.5) AS BIGINT) FROM s
             |  UNION ALL SELECT 'l_returnflag', n, n - nn5, nd5,
             |   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM s
             |  UNION ALL SELECT 'l_shipdate', n, n - nn6, nd6,
             |   CAST(floor(epoch(mn6)) AS BIGINT) * 1000000,
             |   CAST(floor(epoch(mx6)) AS BIGINT) * 1000000 FROM s)
             | ORDER BY column_name""".stripMargin.replace("\n", "")),
      presentOrder = Seq("column_name")),

    // Declarative constraint panel (deequ/great-expectations shape):
    // each check is a named assertion with its VIOLATION COUNT — not
    // just a boolean, so triage sees magnitude. Includes the
    // referential-integrity anti-join (orphaned lineitems) beside the
    // scalar domain checks; every check folds map-side and the panel is
    // a union of one-row aggregates.
    QueryDef("q_quality_checks",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        def check(name: String, violations: org.apache.spark.sql.DataFrame) =
          violations.select(lit(name).as("check_name"),
            col("v").as("violations"), (col("v") === 0L).as("passed"))
        val nullKey = li.agg(
          sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("v"))
        val qtyRange = li.agg(
          sum(when(col("l_quantity").between(1, 50), 0L).otherwise(1L))
            .as("v"))
        val flagDomain = li.agg(
          sum(when(col("l_returnflag").isin("A", "N", "R"), 0L).otherwise(1L))
            .as("v"))
        val orphans = li.select(col("l_orderkey"))
          .join(ord.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("v"))
        val dupOrders = ord.agg(
          (count(lit(1)) - count_distinct(col("o_orderkey"))).as("v"))
        check("lineitem_orderkey_not_null", nullKey)
          .unionAll(check("lineitem_quantity_1_50", qtyRange))
          .unionAll(check("lineitem_returnflag_domain", flagDomain))
          .unionAll(check("lineitem_orphan_orderkeys", orphans))
          .unionAll(check("orders_orderkey_unique", dupOrders))
      },
      Some("""SELECT * FROM (
             | SELECT 'lineitem_orderkey_not_null' AS check_name,
             |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS violations,
             |  sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0
             |    AS passed FROM lineitem
             | UNION ALL SELECT 'lineitem_quantity_1_50',
             |  CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1
             |    END) AS BIGINT),
             |  sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
             |    = 0 FROM lineitem
             | UNION ALL SELECT 'lineitem_returnflag_domain',
             |  CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0
             |    ELSE 1 END) AS BIGINT),
             |  sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1
             |    END) = 0 FROM lineitem
             | UNION ALL SELECT 'lineitem_orphan_orderkeys',
             |  CAST(count(*) AS BIGINT), count(*) = 0
             |  FROM lineitem l WHERE NOT EXISTS (
             |   SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
             | UNION ALL SELECT 'orders_orderkey_unique',
             |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
             |  count(*) = count(DISTINCT o_orderkey) FROM orders)
             | ORDER BY check_name""".stripMargin.replace("\n", "")),
      presentOrder = Seq("check_name"))
  )
}
