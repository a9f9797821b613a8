package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** Scale drive of triangle counting under ADVERSARIAL skew: the gated
  * k-NN-graph run is small and near-regular, so the degree-orientation's
  * reason to exist — the celebrity hub whose unoriented wedge join
  * explodes quadratically — never fires under the correctness gate. This
  * main builds a ~2^20-edge graph that is mostly hostile structure:
  *
  *  - 256 complete 32-cliques (closed-form truth: 256·C(32,3) triangles,
  *    every clique node lcc = exactly 1.0 = 1,000,000 micro),
  *  - ONE 500,000-leaf star (0 triangles; an UNORIENTED wedge join at
  *    the hub would emit C(500k,2) ≈ 1.25·10¹¹ rows — the "last
  *    reducer"; orientation points every leaf→hub, hub out-degree 0,
  *    so the hub contributes ZERO wedges),
  *  - ~400k chain edges for volume (0 triangles).
  *
  * Verifies every closed-form invariant distributed-side and logs wall
  * seconds for the PLANS.md appendix.
  */
object TriScale {
  def main(args: Array[String]): Unit = {
    val cliques = args.lift(0).map(_.toInt).getOrElse(256)
    val k = args.lift(1).map(_.toInt).getOrElse(32)
    val leaves = args.lift(2).map(_.toLong).getOrElse(500000L)
    val chainEdges = args.lift(3).map(_.toLong).getOrElse(400000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Clique nodes: [0, cliques·k). All intra-clique pairs.
    val pairIdx = for (i <- 0 until k; j <- i + 1 until k) yield (i, j)
    val cliqueEdges = spark.range(cliques)
      .crossJoin(pairIdx.toDF("i", "j"))
      .select((col("id") * k + col("i")).as("src"),
        (col("id") * k + col("j")).as("dst"))
    // Star: hub = H, leaves H+1 .. H+leaves.
    val hub = cliques.toLong * k
    val starEdges = spark.range(1, leaves + 1)
      .select(lit(hub).as("src"), (lit(hub) + col("id")).as("dst"))
    // Chains beyond the star ids: consecutive pairs.
    val c0 = hub + leaves + 1
    val chainNodes = spark.range(c0, c0 + chainEdges + 1)
    val chains = chainNodes.filter(col("id") < c0 + chainEdges)
      .select(col("id").as("src"), (col("id") + 1L).as("dst"))
    val edges = cliqueEdges.unionAll(starEdges).unionAll(chains)

    val t0 = System.nanoTime()
    val out = GraphOps.triangleStats(edges).persist()
    val expectTri = cliques.toLong * k * (k - 1) * (k - 2) / 6
    val gotTri3 = out.agg(sum("triangles")).collect()(0).getLong(0)
    val cliquePerNode = (k - 1).toLong * (k - 2) / 2
    val badClique = out.filter(col("node_id") < hub &&
      (col("triangles") =!= cliquePerNode ||
        col("lcc_micro") =!= 1000000L)).count()
    val hubRow = out.filter(col("node_id") === hub).collect()(0)
    val nonZeroOutside = out.filter(col("node_id") >= hub &&
      col("triangles") =!= 0L).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val nEdges = cliques.toLong * k * (k - 1) / 2 + leaves + chainEdges
    println(f"TRISCALE edges=$nEdges triangles=${gotTri3 / 3} " +
      f"expected=$expectTri hubDeg=${hubRow.getLong(1)} " +
      f"hubTri=${hubRow.getLong(2)} badClique=$badClique " +
      f"nonZeroOutside=$nonZeroOutside sec=$sec%.1f")
    assert(gotTri3 == 3L * expectTri, "triangle total mismatch")
    assert(badClique == 0L, "a clique node missed its closed-form count")
    assert(hubRow.getLong(2) == 0L && nonZeroOutside == 0L,
      "star/chain structure produced phantom triangles")
    spark.stop()
  }
}
