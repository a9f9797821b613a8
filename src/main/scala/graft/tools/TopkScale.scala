package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale drive of the TopKPerKey operator under a celebrity key: one
  * key holding 2^20 rows beside 256 uniform background keys, k = 3.
  * The window form sorts the full feed inside each group (the hot
  * group pays n·log n and its whole row set crosses the shuffle); the
  * bounded-heap pair ships 3 rows per (key × map partition) and never
  * sorts. Both paths must return identical rows — verified before
  * timings are reported. */
object TopkScale {
  def main(args: Array[String]): Unit = {
    val hot = args.lift(0).map(_.toInt).getOrElse(1 << 20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftFunctions.register(spark)
    val bg = 256L * 4096
    // WIDE rows: the window form must shuffle every payload byte to the
    // sorter; the heap form ships only the retained k rows per (key ×
    // map partition). On slim rows both paths are shuffle-trivial and
    // codegen'd sort wins on constants — payload width is what a real
    // "top documents per domain" feed looks like.
    val df = spark.range(hot + bg).select(
      when(col("id") < hot, 0L).otherwise(col("id") % 256 + 1).as("k"),
      col("id"),
      (col("id") * 2654435761L % 1000000007L).as("v"),
      concat(lit("p" * 396), col("id")).as("payload"))
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    def q = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
    def run(label: String, enabled: Boolean): Set[(Long, Long, Long, Int)] = {
      spark.conf.set("spark.graft.topk.rewrite", enabled.toString)
      val t0 = System.nanoTime()
      val rows = q.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4)))
        .toSet
      println(f"TOPKSCALE $label rows=${rows.size} " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      rows
    }
    run("warmup-heap", enabled = true)
    val a = run("heap", enabled = true)
    val b = run("window", enabled = false)
    assert(a == b, "heap and window paths disagree")
    println(s"TOPKSCALE identical=true hot=$hot")
    spark.stop()
  }
}
