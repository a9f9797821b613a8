package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimOps

/** Recall sweep for [[SimOps.topKIvf]] across (cells, nprobe,
  * trainRounds): the memoized k-means training makes re-training cheap,
  * so this drives the knob choice recorded in SimQueries. Prints
  * recall@10 vs brute force plus the scanned-corpus fraction
  * (nprobe/cells) each configuration pays. */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftFunctions.register(spark)
    val v = graft.Tables.embeddings(spark, sfDir)
    val brute = SimOps.topKBruteForce(v, col("vec_id") < 10, 10)
      .select(col("query_id"), col("neighbor_id")).persist()
    for ((c, np, tr) <- Seq((32,10,4), (32,12,4))) {
      val g = SimOps.topKIvf(v, col("vec_id") < 10, 10, c = c, nprobe = np,
          trainRounds = tr, dim = 64)
        .select(col("query_id"), col("neighbor_id"))
      val m = brute.join(g, Seq("query_id", "neighbor_id")).count()
      println(f"IVFSWEEP cells=$c nprobe=$np trainRounds=$tr " +
        f"scan=${np.toDouble / c}%.2f recall=${m / 100.0}%.2f")
    }
    spark.stop()
  }
}
