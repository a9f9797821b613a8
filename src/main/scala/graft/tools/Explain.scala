package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Catalog

/** Dev tool: print the formatted physical plan of the named queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val want = args.toSet
    Catalog.all.filter(q => want.isEmpty || want(q.name)).foreach { q =>
      println(s"===== ${q.name} =====")
      q.run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
