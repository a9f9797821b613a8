package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Relational inventory, batch 2 (SURVEY.md §2.11): pivot, statistical
  * aggregates, exact percentiles, HLL sketch, regexp/JSON scalar
  * functions, scalar subquery, GROUPING SETS through the SQL entry point,
  * ranked window functions, date arithmetic.
  */
object RelQueries2 {

  val defs: Seq[QueryDef] = Seq(

    // Pivot: linestatus columns per returnflag — conditional aggregation
    // under the hood; the oracle states that form explicitly.
    QueryDef("q_pivot_status",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o"),
      Some("""SELECT l_returnflag,
             | round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
             | round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
             | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", "")),
      presentOrder = Seq("l_returnflag")),

    // Statistical aggregates: stddev/variance/correlation (sample forms).
    QueryDef("q_stats_aggs",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          // Rounded stats quantized via DECIMAL(18,4) then output as DOUBLE
          // (exact 4dp value, hash-stable rendering on both sides).
          round(stddev_samp(col("l_extendedprice")), 4).cast("decimal(18,4)").cast("double").as("sd_price"),
          round(var_samp(col("l_quantity")), 4).cast("decimal(18,4)").cast("double").as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).cast("decimal(18,4)").cast("double").as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4).cast("decimal(18,4)").cast("double").as("cov_qty_disc")),
      Some("""SELECT l_returnflag,
             | CAST(round(stddev_samp(l_extendedprice), 4) AS DECIMAL(18,4))::DOUBLE AS sd_price,
             | CAST(round(var_samp(l_quantity), 4) AS DECIMAL(18,4))::DOUBLE AS var_qty,
             | CAST(round(corr(l_quantity, l_extendedprice), 4) AS DECIMAL(18,4))::DOUBLE AS corr_qty_price,
             | CAST(round(covar_samp(l_quantity, l_discount), 4) AS DECIMAL(18,4))::DOUBLE AS cov_qty_disc
             | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", "")),
      presentOrder = Seq("l_returnflag")),

    // Exact interpolated percentiles (Spark `percentile` == DuckDB
    // `quantile_cont`). SCALE CUTOVER RULE: Spark's exact `percentile`
    // buffers every value of a group in executor memory, so it is only
    // valid on bounded-cardinality grouping keys with bounded group sizes
    // that fit an executor (here: 5 order priorities). At 100 TB the
    // gated answer for unbounded groups is `q_approx_percentile`
    // (mergeable t-digest sketch, constant memory, tolerance oracle).
    // PlanSpec("exact percentiles stay on bounded-group inputs") guards
    // this query's group cardinality.
    QueryDef("q_percentiles",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).cast("decimal(18,4)").cast("double").as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).cast("decimal(18,4)").cast("double").as("p50"),
          round(expr("percentile(o_totalprice, 0.75)"), 4).cast("decimal(18,4)").cast("double").as("p75"),
          count(lit(1)).as("n")),
      Some("""SELECT o_orderpriority,
             | CAST(round(quantile_cont(o_totalprice, 0.25), 4) AS DECIMAL(18,4))::DOUBLE AS p25,
             | CAST(round(quantile_cont(o_totalprice, 0.5), 4) AS DECIMAL(18,4))::DOUBLE AS p50,
             | CAST(round(quantile_cont(o_totalprice, 0.75), 4) AS DECIMAL(18,4))::DOUBLE AS p75,
             | count(*) AS n
             | FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace("\n", "")),
      presentOrder = Seq("o_orderpriority")),

    // HLL sketch: approx_count_distinct beside the exact count. The sketch
    // estimate is engine-specific, so the gate uses a tolerance oracle:
    // exact count compared exactly, the HLL value as a within-3×rsd
    // boolean (default rsd = 0.05) whose twin is TRUE — an out-of-bound
    // sketch flips the boolean and fails the hash compare.
    QueryDef("q_hll_approx",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("__approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .withColumn("approx_within_bound",
          abs(col("__approx") - col("exact_parts")) <=
            col("exact_parts") * (3 * 0.05))
        .select("l_returnflag", "exact_parts", "approx_within_bound"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             | TRUE AS approx_within_bound
             | FROM lineitem GROUP BY l_returnflag
             | ORDER BY l_returnflag""".stripMargin.replace("\n", "")),
      presentOrder = Seq("l_returnflag")),

    // Regexp scalar surface: extract / replace / match over part names.
    QueryDef("q_regexp_funcs",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_brand"), "[0-9]+", "#").as("brand_masked"),
          col("p_type").rlike("^STANDARD").cast("int").as("is_standard")),
      Some("""SELECT p_partkey,
             | regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
             | regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked,
             | CAST(regexp_matches(p_type, '^STANDARD') AS INT) AS is_standard
             | FROM part ORDER BY p_partkey""".stripMargin.replace("\n", "")),
      presentOrder = Seq("p_partkey")),

    // JSON decode via from_json (schema'd) vs the oracle's json_extract.
    QueryDef("q_json_decode",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), lit("k INT")).getField("k").as("k")),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INT) AS k
             | FROM events ORDER BY event_id""".stripMargin.replace("\n", "")),
      presentOrder = Seq("event_id")),

    // Scalar subquery: orders above the global average price.
    QueryDef("q_scalar_subquery",
      (s, d) => {
        val avgPrice = Tables.orders(s, d).agg(avg(col("o_totalprice")).as("ap"))
        Tables.orders(s, d).crossJoin(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("ap"))
          .select(col("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             | WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
             | ORDER BY o_orderkey""".stripMargin.replace("\n", "")),
      presentOrder = Seq("o_orderkey")),

    // GROUPING SETS through the SQL entry point (spark.sql + temp view):
    // the engine's SQL surface is part of the contract.
    QueryDef("q_grouping_sets_sql",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                 round(sum(o_totalprice), 2) AS sum_price
                 FROM orders_v
                 GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             | round(sum(o_totalprice), 2) AS sum_price FROM orders
             | GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
             | ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin.replace("\n", "")),
      presentOrder = Seq("o_orderstatus", "o_orderpriority")),

    // Ranked window surface: dense_rank / ntile / percent_rank share one
    // (partition, order) shuffle.
    QueryDef("q_window_ranks",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("drank", dense_rank().over(w))
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("prank", round(percent_rank().over(w), 4).cast("decimal(18,4)").cast("double"))
          .filter(col("drank") <= 5)
          .select("o_orderpriority", "o_orderkey", "drank", "quartile", "prank")
      },
      Some("""SELECT o_orderpriority, o_orderkey, drank, quartile, prank FROM (
             | SELECT o_orderpriority, o_orderkey,
             |  CAST(dense_rank() OVER w AS INT) AS drank,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  CAST(round(percent_rank() OVER w, 4) AS DECIMAL(18,4))::DOUBLE AS prank
             | FROM orders
             | WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey))
             | WHERE drank <= 5 ORDER BY o_orderpriority, o_orderkey""".stripMargin.replace("\n", "")),
      presentOrder = Seq("o_orderpriority", "o_orderkey")),

    // Date arithmetic: add/diff/truncate/last_day over order dates.
    QueryDef("q_date_arith",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_add(col("o_orderdate"), 30).as("due_date"),
          last_day(col("o_orderdate")).as("month_end"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate")).as("days_to_eoy"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("quarter_start")),
      Some("""SELECT o_orderkey,
             | CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
             | last_day(CAST(o_orderdate AS DATE)) AS month_end,
             | CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_eoy,
             | CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
             | FROM orders ORDER BY o_orderkey""".stripMargin.replace("\n", "")),
      presentOrder = Seq("o_orderkey"))
  )
}
