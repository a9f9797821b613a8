package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Catalog

/** Dev tool: run every catalog query twice in one JVM to separate
  * cold (codegen/JIT/classload) cost from steady-state cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val rows = Catalog.all.map { q =>
      val cold = time(q.run(spark, sfDir).count())
      val warm = time(q.run(spark, sfDir).count())
      println(f"${q.name}%-30s cold ${cold}%7.2fs warm ${warm}%7.2fs")
      (q.name, cold, warm)
    }
    println(f"TOTAL cold ${rows.map(_._2).sum}%.2fs warm ${rows.map(_._3).sum}%.2fs")
    spark.stop()
  }
}
