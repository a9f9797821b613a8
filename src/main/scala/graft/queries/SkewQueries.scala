package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ops.SkewOps

/** Skew-mitigation operators on the gate: the oracle for a salted plan is
  * the PLAIN join/aggregation SQL — DuckDB re-proves every round that
  * salting changes partitioning, never results.
  */
object SkewQueries {

  val defs: Seq[QueryDef] = Seq(

    // Salted equi-join lineitem⋈orders (o_orderkey): hot-key-safe shape
    // for when the build side exceeds the broadcast threshold.
    QueryDef("q_salted_join",
      (s, d) => SkewOps.saltedJoin(
          Tables.lineitem(s, d).select(col("l_orderkey").as("k"), col("l_quantity")),
          Tables.orders(s, d).select(col("o_orderkey").as("k"), col("o_orderpriority")),
          "k", saltBuckets = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty")),
      Some("""SELECT o_orderpriority, count(*) AS n,
             | round(sum(l_quantity), 2) AS sum_qty
             | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             | GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace("\n", "")),
      presentOrder = Seq("o_orderpriority")),

    // Salted two-phase aggregation over the (low-cardinality, hence
    // hot-keyed) returnflag/linestatus keys.
    QueryDef("q_salted_agg",
      (s, d) => SkewOps.saltedAgg(
          Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity")),
          Seq("l_returnflag"), saltBuckets = 8,
          partials = Seq(
            ("n", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
            // partials stay unrounded; only the final result rounds
            ("sum_qty", sum(col("l_quantity")),
              (c: org.apache.spark.sql.Column) => round(sum(c), 2)))),
      Some("""SELECT l_returnflag, count(*) AS n,
             | round(sum(l_quantity), 2) AS sum_qty
             | FROM lineitem GROUP BY l_returnflag
             | ORDER BY l_returnflag""".stripMargin.replace("\n", "")),
      presentOrder = Seq("l_returnflag"))
  )
}
