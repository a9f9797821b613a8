package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Core relational inventory (SURVEY.md §2.11) over the TPC-H-ish tables:
  * hash aggregation, broadcast/shuffle joins, semi/anti joins, window
  * functions, top-k, set ops, rollup/cube, scalar functions.
  *
  * Conventions: every floating output is rounded identically on both sides
  * (sum→2dp, avg/ratio→4dp) so partial-agg accumulation order can't flip
  * the driver's hash compare; every query ends with a total deterministic
  * ORDER BY on a unique key set.
  */
object RelQueries {

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape: single-pass hash aggregation with map-side partial
    // combine; filter + 7-column projection are pushed to the parquet scan.
    QueryDef("q1_pricing_summary",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          // Rounded averages quantized in DECIMAL(18,4) (exact 4dp value both
          // engines agree on) then cast back to DOUBLE (the rendering the
          // driver's hash treats consistently — DECIMAL trailing zeros fail).
          round(avg(col("l_quantity")), 4).cast("decimal(18,4)").cast("double").as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).cast("decimal(18,4)").cast("double").as("avg_price"),
          round(avg(col("l_discount")), 4).cast("decimal(18,4)").cast("double").as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             | round(sum(l_quantity), 2) AS sum_qty,
             | round(sum(l_extendedprice), 2) AS sum_base_price,
             | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             | CAST(round(avg(l_quantity), 4) AS DECIMAL(18,4))::DOUBLE AS avg_qty,
             | CAST(round(avg(l_extendedprice), 4) AS DECIMAL(18,4))::DOUBLE AS avg_price,
             | CAST(round(avg(l_discount), 4) AS DECIMAL(18,4))::DOUBLE AS avg_disc,
             | count(*) AS count_order
             | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             | GROUP BY l_returnflag, l_linestatus
             | ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", "")),
      presentOrder = Seq("l_returnflag", "l_linestatus")),

    // Multi-way join: dimension chain region←nation←customer is broadcast
    // (auto under the threshold; hinted to be explicit), fact side stays
    // un-shuffled until the final aggregation.
    QueryDef("q_join_dims",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("sum_acctbal")),
      Some("""SELECT r_name, n_name, count(*) AS n_customers,
             | round(sum(c_acctbal), 2) AS sum_acctbal
             | FROM customer JOIN nation ON c_nationkey = n_nationkey
             | JOIN region ON n_regionkey = r_regionkey
             | GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin.replace("\n", "")),
      presentOrder = Seq("r_name", "n_name")),

    // Large-side equi join (orders ⋈ lineitem): at 100 TB this is the
    // shuffle that matters — both sides hash-partition on the key once and
    // AQE can pick shuffled-hash / skew-split at runtime.
    QueryDef("q_join_facts",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice")), 2).as("sum_price")),
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
             | round(sum(l_extendedprice), 2) AS sum_price
             | FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             | GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace("\n", "")),
      presentOrder = Seq("o_orderpriority")),

    // Left-semi join = EXISTS: customers having at least one open order.
    QueryDef("q_join_semi",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             | WHERE EXISTS (SELECT 1 FROM orders
             |   WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
             | ORDER BY c_custkey""".stripMargin.replace("\n", "")),
      presentOrder = Seq("c_custkey")),

    // Left-anti join = NOT EXISTS: customers with no orders at all.
    QueryDef("q_join_anti",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             | ORDER BY c_custkey""".stripMargin.replace("\n", "")),
      presentOrder = Seq("c_custkey")),

    // Top-k: orderBy(...).limit(k) plans as TakeOrderedAndProject — a
    // per-partition heap + single driver merge, no global sort. Unique
    // o_orderkey tiebreak keeps the cutoff deterministic.
    QueryDef("q_topk_orders",
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin.replace("\n", ""))),

    // Window functions: rank / lag / running sum per customer over order
    // history — one shuffle by o_custkey shared by all three frames.
    QueryDef("q_window_orders",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("order_seq", row_number().over(w))
          .withColumn("prev_price", round(lag(col("o_totalprice"), 1).over(w), 2))
          .withColumn("running_spend", round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
          .select("o_custkey", "o_orderkey", "order_seq", "prev_price", "running_spend")
      },
      Some("""SELECT o_custkey, o_orderkey,
             | CAST(row_number() OVER w AS INT) AS order_seq,
             | round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
             | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
             | FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             | ORDER BY o_custkey, o_orderkey""".stripMargin.replace("\n", "")),
      presentOrder = Seq("o_custkey", "o_orderkey")),

    // ROLLUP grouping-set aggregation (region → nation → grand total).
    QueryDef("q_rollup_nations",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers")),
      Some("""SELECT r_name, n_name, count(*) AS n_customers
             | FROM customer JOIN nation ON c_nationkey = n_nationkey
             | JOIN region ON n_regionkey = r_regionkey
             | GROUP BY ROLLUP (r_name, n_name)
             | ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin.replace("\n", "")),
      presentOrder = Seq("r_name", "n_name")),

    // CUBE over the lineitem flag/status pair.
    QueryDef("q_cube_flags",
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             | round(sum(l_quantity), 2) AS sum_qty
             | FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             | ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin.replace("\n", "")),
      presentOrder = Seq("l_returnflag", "l_linestatus")),

    // Exact distinct aggregation (expands to a two-phase aggregate).
    QueryDef("q_distinct_counts",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
             | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", "")),
      presentOrder = Seq("l_returnflag")),

    // Set operations: union / intersect / except on customer key sets,
    // tagged so all three land in one verifiable result.
    QueryDef("q_set_ops",
      (s, d) => {
        val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey")).distinct()
        val done = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey")).distinct()
        val both = open.intersect(done).withColumn("tag", lit("both"))
        val onlyOpen = open.except(done).withColumn("tag", lit("open_only"))
        val either = open.union(done).distinct().withColumn("tag", lit("either"))
        both.union(onlyOpen).union(either)
      },
      Some("""WITH open AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
             | done AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
             | SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM open INTERSECT SELECT * FROM done)
             | UNION ALL SELECT o_custkey, 'open_only' AS tag FROM (SELECT * FROM open EXCEPT SELECT * FROM done)
             | UNION ALL SELECT o_custkey, 'either' AS tag FROM (SELECT * FROM open UNION SELECT * FROM done)
             | ORDER BY tag, o_custkey""".stripMargin.replace("\n", "")),
      presentOrder = Seq("tag", "o_custkey")),

    // Scalar string-function surface (SURVEY.md §2.9): split/upper/substr/
    // length/concat/trim — all codegen'd built-ins, no UDFs.
    QueryDef("q_string_funcs",
      (s, d) => Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          size(split(col("p_type"), " ")).as("type_words"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type")),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_upper,
             | substring(p_name, 1, 8) AS name_prefix,
             | CAST(length(p_name) AS INT) AS name_len,
             | CAST(len(string_split(p_type, ' ')) AS INT) AS type_words,
             | concat_ws('|', p_brand, p_type) AS brand_type
             | FROM part ORDER BY p_partkey""".stripMargin.replace("\n", "")),
      presentOrder = Seq("p_partkey")),

    // Scalar date-function surface: year/quarter/month/dow extraction and
    // month truncation over order dates.
    QueryDef("q_date_funcs",
      (s, d) => Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).as("o_year"),
          quarter(col("o_orderdate")).as("o_quarter"),
          month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price")),
      Some("""SELECT CAST(date_part('year', o_orderdate) AS INT) AS o_year,
             | CAST(date_part('quarter', o_orderdate) AS INT) AS o_quarter,
             | CAST(date_part('month', o_orderdate) AS INT) AS o_month,
             | count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
             | FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin.replace("\n", "")),
      presentOrder = Seq("o_year", "o_quarter", "o_month")),

    // CASE/WHEN bucketing (price bands) + conditional aggregation.
    QueryDef("q_case_buckets",
      (s, d) => Tables.orders(s, d)
        .withColumn("band",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("o_totalprice")), 4).cast("decimal(18,4)").cast("double").as("avg_price"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open")),
      Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
             | WHEN o_totalprice < 150000 THEN 'medium' ELSE 'large' END AS band,
             | count(*) AS n, CAST(round(avg(o_totalprice), 4) AS DECIMAL(18,4))::DOUBLE AS avg_price,
             | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open
             | FROM orders GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", "")),
      presentOrder = Seq("band"))
  )
}
