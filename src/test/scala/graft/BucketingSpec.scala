package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed co-located joins: the join over matching bucket specs must
  * plan with NO Exchange on either side, and produce the same result as
  * the shuffled join. */
class BucketingSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("clustered write: files hold disjoint key ranges; key predicate prunes to one file") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-cluster").toString + "/t"
    val orders = Tables.orders(spark, d).select("o_orderkey", "o_totalprice")
    Bucketing.writeClustered(orders, dir, "o_orderkey", files = 4)
    // Every row survives, and per-file key ranges are pairwise disjoint —
    // the property that lets parquet min/max stats skip whole files.
    val back = spark.read.parquet(dir)
    assert(back.count() === orders.count())
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length === 4)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlap: ${ranges.toSeq}")
      case _ =>
    }
    // Runtime proof, not plan text: a point predicate on the clustered
    // key must make the parquet scan OUTPUT ~one file's rows, because
    // footer min/max stats of the other three files exclude the key.
    val key = ranges(2)._1 // a key owned by the third file
    val q = back.filter(col("o_orderkey") === key)
    assert(q.collect().length >= 1)
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val scanned = scan.metrics("numOutputRows").value
    val total = orders.count()
    assert(scanned <= total / 2,
      s"scan read $scanned of $total rows — stats pruning did not engage")
  }

  test("matching bucket specs join with zero exchange, same results") {
    val orders = Tables.orders(spark, d).select("o_orderkey", "o_orderpriority")
    val lineitem = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 8, Some("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 8, Some("l_orderkey"))

    val joined = Bucketing.coLocatedJoin(spark, "orders_b", "lineitem_b",
      "o_orderkey", "l_orderkey")
    // disable auto-broadcast so the bucketed sort-merge path is what's planned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      val viaBuckets = joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val viaShuffle = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaBuckets === viaShuffle)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned layout prunes whole partitions at planning time") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    Bucketing.writePartitioned(
      Tables.events(spark, d).select("event_id", "ts", "event_type", "value"),
      dir, Seq("event_type"))
    val types = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("event_type="))
    assert(types > 1, "expected one directory per event_type")
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
    // The equality filter must land in PartitionFilters (directory-level
    // pruning), not only in PushedFilters (file-level row-group skipping).
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter not applied at planning time:\n$scan")
    val full = spark.read.parquet(dir).select("event_id").count()
    val pruned = q.select("event_id").count()
    assert(pruned > 0 && pruned < full)
  }
}
