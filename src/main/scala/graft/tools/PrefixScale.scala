package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.SkewOps

/** Scale drive of the distributed prefix sum's one-reducer claim: at
  * gate scale a `sum(...) over (order by k)` global window looks fine,
  * but Spark executes it on a SINGLE partition — every row through one
  * task regardless of cluster size. This main generates `rows` (k, v)
  * rows, times the global-window form against `SkewOps.prefixSums`
  * (range partitions + partition-local windows + broadcast offsets) on
  * the SAME data, and verifies both produce the identical checksum of
  * running totals.
  *
  * Expected: the global window's wall time is flat in core count (one
  * reducer does all the work — at 2^22 rows it's already the visible
  * bottleneck, and at corpus scale it simply does not finish), while
  * prefixSums scales with partitions; the gap widens linearly with
  * input size.
  */
object PrefixScale {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(1L << 22)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(rows)
      .select(col("id").as("k"), (col("id") % 1000).as("v"))
      .localCheckpoint() // both arms read the same materialized input
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def checksum(d: org.apache.spark.sql.DataFrame): Long =
      d.select(xxhash64(col("k"), col("c")).as("h"))
        .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    val w = Window.orderBy(col("k"))
    val (tGlobal, csGlobal) = time {
      checksum(df.withColumn("c", sum(col("v")).over(w)))
    }
    val (tDist, csDist) = time {
      checksum(SkewOps.prefixSums(df, Seq("k"), Seq("c" -> col("v"))))
    }
    println(f"PREFIXSCALE rows=$rows global=$tGlobal%.2fs dist=$tDist%.2fs " +
      f"speedup=${tGlobal / tDist}%.1fx agree=${csGlobal == csDist}")
    spark.stop()
  }
}
