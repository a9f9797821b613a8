package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** Scale drive of the BFS frontier loop: the gated `graph_bfs_layers`
  * runs 4 rounds over a 2.5k-node k-NN graph, far below anything that
  * stresses the per-round join/anti-join. This main drives a 2^20-edge
  * synthetic: one hub (the seed) fanning out to `fanout` chains of
  * length `len` — round 1's frontier is the full `fanout` breadth (the
  * widest layer a trust-propagation sweep plausibly hits), and every
  * later round keeps that width, so persist + anti-join costs are
  * measured at constant worst-case frontier size. Distances have a
  * closed form (node (c, p) sits at depth p), so every label is
  * verified, and unreached-node handling is exercised by an extra
  * disconnected block.
  */
object BfsScale {
  def main(args: Array[String]): Unit = {
    val fanout = args.lift(0).map(_.toInt).getOrElse(131072)
    val len = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Chain c occupies ids [c*len+1, (c+1)*len]; hub 0 feeds every chain
    // head; plus `fanout` disconnected ids above the reachable block.
    val top = fanout.toLong * len
    val heads = spark.range(fanout)
      .select(lit(0L).as("src"), (col("id") * len + 1L).as("dst"))
    val links = spark.range(top)
      .filter(col("id") % len =!= 0L && col("id") =!= 0L)
      .select(col("id").as("src"), (col("id") + 1L).as("dst"))
      .filter(col("dst") <= top)
    val edges = heads.unionAll(links)
    val nodes = spark.range(top + fanout + 1).select(col("id").as("node_id"))
    val t0 = System.nanoTime()
    val out = GraphOps.bfsLayers(nodes, edges, col("node_id") === 0L, len)
    // Closed form: dist(0)=0; dist(id in 1..top) = (id-1) % len + 1;
    // ids above `top` are disconnected -> -1.
    val wrong = out.filter(
      col("dist") =!= when(col("node_id") === 0L, 0)
        .when(col("node_id") <= top,
          ((col("node_id") - 1L) % len + 1L).cast("int"))
        .otherwise(-1)).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"BFSSCALE edges=${top} rounds=$len wrong=$wrong sec=$sec%.1f")
    assert(wrong == 0L, "bfsLayers produced a wrong distance")
    spark.stop()
  }
}
