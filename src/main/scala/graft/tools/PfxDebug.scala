package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.SkewOps
object PfxDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(100000)
      .select(col("id").as("k"), (col("id") % 1000).as("v"))
      .localCheckpoint()
    val w = Window.orderBy(col("k"))
    val g = df.withColumn("c", sum(col("v")).over(w)).select("k", "c")
    val p = SkewOps.prefixSums(df, Seq("k"), Seq("c" -> col("v"))).select("k", "c")
    val diff = g.as("g").join(p.as("p"), Seq("k"))
      .filter(col("g.c") =!= col("p.c"))
    println("DIFF count=" + diff.count())
    diff.orderBy("k").show(5)
    println("G rows=" + g.count() + " P rows=" + p.count())
    spark.stop()
  }
}
