package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimOps

/** Recall sweep for [[SimOps.topKGraphBeam]]: measures recall@10 vs the
  * brute-force exact top-k across (graph degree, beam, rounds, entries)
  * — graph DEGREE is the dominant lever (NSW navigability), which is why
  * `sim_topk_graph` searches a degree-10 graph while the analytics stack
  * keeps KnnK = 5. Numbers recorded in SimQueries' constants scaladoc. */
object GraphSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftFunctions.register(spark)
    val v = graft.Tables.embeddings(spark, sfDir)
    val brute = SimOps.topKBruteForce(v, col("vec_id") < 10, 10)
      .select(col("query_id"), col("neighbor_id")).persist()
    for ((kk, b, r, e) <- Seq((5,16,5,16), (10,12,5,12), (10,16,5,16))) {
      val edges = SimOps.knnEdgesCached(v, kk, graft.queries.SimQueries.LshTabs)
      val g = SimOps.topKGraphBeam(v, col("vec_id") < 10, 10, edges, b, r, e)
        .select(col("query_id"), col("neighbor_id"))
      val m = brute.join(g, Seq("query_id", "neighbor_id")).count()
      println(s"GRAPHSWEEP knnK=$kk beam=$b rounds=$r entries=$e recall=${m / 100.0}")
    }
    spark.stop()
  }
}
