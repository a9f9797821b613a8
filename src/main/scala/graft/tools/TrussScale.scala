package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** Scale drive of k-truss under ADVERSARIAL hub skew: the gated
  * k-NN-graph run is near-regular, so the degree-ordered apex support
  * count — the reason the raw two-sided wedge join was replaced — never
  * fires under the correctness gate. This main builds a graph that is
  * mostly hostile structure:
  *
  *  - 64 complete 32-cliques (closed-form truth: every clique edge has
  *    support 30 and survives k=4; the truss IS the cliques),
  *  - ONE star hub whose leaf count DOUBLES across runs (2^15 → 2^17):
  *    0 triangles, so every star edge peels in round 1 — but a raw
  *    wedge join computes support by pairing the hub's neighbors,
  *    C(2^17, 2) ≈ 8.6e9 rows inside ONE join group before the peel
  *    can happen ("the curse of the last reducer"). The degree-ordered
  *    orientation points every leaf → hub, the hub's out-degree is 0,
  *    and the star contributes ZERO wedge rows — per-round cost must
  *    stay FLAT as the hub doubles,
  *  - 100k chain edges for volume (0 triangles, peel round 1).
  *
  * Verifies the closed-form truss distributed-side and logs wall
  * seconds per hub size for the PLANS.md appendix.
  */
object TrussScale {
  def main(args: Array[String]): Unit = {
    val cliques = args.lift(0).map(_.toInt).getOrElse(64)
    val k = args.lift(1).map(_.toInt).getOrElse(32)
    val chainEdges = args.lift(2).map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pairIdx = for (i <- 0 until k; j <- i + 1 until k) yield (i, j)
    import spark.implicits._
    val cliqueEdges = spark.range(cliques)
      .crossJoin(pairIdx.toDF("i", "j"))
      .select((col("id") * k + col("i")).as("src"),
        (col("id") * k + col("j")).as("dst"))
    val hub = cliques.toLong * k
    val cliqueEdgeCount = cliques.toLong * k * (k - 1) / 2

    for (exp <- 15 to 17) {
      val leaves = 1L << exp
      val starEdges = spark.range(1, leaves + 1)
        .select(lit(hub).as("src"), (lit(hub) + col("id")).as("dst"))
      val c0 = hub + leaves + 1
      val chains = spark.range(c0, c0 + chainEdges)
        .select(col("id").as("src"), (col("id") + 1L).as("dst"))
      val edges = cliqueEdges.unionAll(starEdges).unionAll(chains)

      val t0 = System.nanoTime()
      val out = GraphOps.kTruss(edges, k = 4, rounds = 3).persist()
      val inTruss = out.filter(col("in_truss") === 1)
      val nIn = inTruss.count()
      val badSupport = inTruss.filter(col("truss_support") =!= 30L).count()
      val hubSurvivors = out.filter(
        (col("u") === hub || col("v") === hub) &&
          col("in_truss") === 1).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val nEdges = cliqueEdgeCount + leaves + chainEdges
      println(f"TRUSSSCALE hubDeg=$leaves edges=$nEdges " +
        f"inTruss=$nIn expected=$cliqueEdgeCount " +
        f"badSupport=$badSupport hubSurvivors=$hubSurvivors sec=$sec%.1f")
      assert(nIn == cliqueEdgeCount, "truss must be exactly the cliques")
      assert(badSupport == 0L, "every truss edge closes 30 triangles")
      assert(hubSurvivors == 0L, "no star edge survives the peel")
      out.unpersist()
    }
    spark.stop()
  }
}
