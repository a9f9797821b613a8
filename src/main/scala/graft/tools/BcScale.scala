package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** Scale drive of [[GraphOps.betweennessCentrality]]'s pivot budget:
  * the Brandes–Pich claim is cost LINEAR in the pivot count k (forward
  * and backward passes carry Θ(k·frontier) slim rows per round, the
  * round count is graph-eccentricity-bounded and k-free), so doubling
  * k must roughly double the row work while wall time stays dominated
  * by the FIXED per-round BSP overhead until k·frontier saturates the
  * executor. Drives k doubling 4→64 on the gated corpus k-NN expander
  * and prints seconds and ms/pivot; the k=16 run's checksum is
  * asserted equal to the `graph_betweenness` GATE's own result
  * (computed through `SparkEntry.queries`, the driver's code path),
  * so the harness pins gate equality — not merely run-to-run
  * determinism.
  *
  * Usage: runMain graft.tools.BcScale [sfDir] [maxK] (default sf0.1,
  * maxK 64). */
object BcScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxK = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftFunctions.register(spark)
    spark.conf.set("graft.knn.dir",
      java.nio.file.Files.createTempDirectory("graft-knn").toString)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val edges = graft.ops.SimOps.knnEdgesCached(emb,
        graft.queries.SimQueries.KnnK, graft.queries.SimQueries.LshTabs)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint()
    val nodes = emb.select(col("vec_id").as("node_id")).localCheckpoint()
    def run(k: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val cs = GraphOps.betweennessCentrality(nodes, edges, k = k,
          maxDepth = 6)
        .agg(expr("CAST(bit_xor(hash(node_id, bc_micro)) AS BIGINT)"))
        .collect()(0).getLong(0)
      (cs, (System.nanoTime() - t0) / 1e9)
    }
    run(4) // warm codegen/JIT before any timed row
    // The gate's own result through the driver's code path: the k=16
    // harness run below must checksum-equal it (gate equality, not
    // just determinism).
    val gateCs = graft.SparkEntry.queries("graph_betweenness")(spark, sfDir)
      .agg(expr("CAST(bit_xor(hash(node_id, bc_micro)) AS BIGINT)"))
      .collect()(0).getLong(0)
    println("BCSCALE    k    sec  ms/pivot")
    var k = 4
    while (k <= maxK) {
      val (cs, s) = run(k)
      if (k == 16) assert(cs == gateCs,
        s"k=16 harness run diverged from the graph_betweenness gate")
      println(f"BCSCALE $k%4d $s%6.2f  ${s * 1000 / k}%8.1f")
      k *= 2
    }
    spark.stop()
  }
}
