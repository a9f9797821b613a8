package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.EgvOps
import graft.queries.EgvQueries

/** Dev scratchpad for isolating perf anomalies. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($r)")
    }
    val ev = Tables.events(spark, d)
    time("events.count")(ev.count())
    time("events.count again")(ev.count())
    time("tod only")(ev.withColumn("tod", EgvOps.secondsOfDay(col("ts"))).agg(sum("tod")).collect()(0))
    val joined = EgvOps.categorizeWithLookup(ev, EgvQueries.rangesDf(spark))
    time("lookup join count")(joined.count())
    time("lookup join count again")(joined.count())
    time("lookup join no-order collect-agg")(joined.agg(count(lit(1))).collect()(0))
    val fast = EgvOps.lookupFirstMatch(ev, graft.model.Schemas.fixtureRanges)
    time("fast lookup count")(fast.count())
    spark.stop()
  }
}
