package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.DedupOps

/** Plan inspection for the current hotspot. */
object Explain {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)
    val sets = DedupOps.shingleSets(docs, "text", "doc_id")
    val sigs = DedupOps.signatures(sets, 16)
    sigs.explain("formatted")
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"EXPLAIN $tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($r)")
    }
    val inv = sets.select(col("doc_id"), explode(col("sh")).as("h"))
      .withColumn("x", col("h") % DedupOps.P)
    for (_ <- 1 to 2) {
      time("inv count")(inv.count())
      time("groupBy 1 min")(
        inv.groupBy("doc_id").agg(min((lit(3L) * col("x") + 7L) % DedupOps.P)).count())
      time("groupBy 16 mins")(DedupOps.signatures(sets, 16).count())
      time("groupBy 16 mins no-mod")(
        inv.groupBy("doc_id").agg(
          min(col("x") + 1).as("m0"),
          (2 to 16).map(i => min(col("x") + i).as(s"m$i")): _*).count())
    }
    spark.stop()
  }
}
