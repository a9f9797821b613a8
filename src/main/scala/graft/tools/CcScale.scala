package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Scale drive of the DISTRIBUTED connected-components path: every gated
  * run's pair set sits far below `DriverCcMaxEdges`, so the min-label +
  * pointer-jumping loop never executes under the correctness gate. This
  * main forces it (fast-path threshold 0) on a synthetic 2^20-edge graph
  * — 1024 disjoint 1024-node chains, the worst per-component diameter a
  * near-dup cluster plausibly reaches — at local[32], verifies every
  * label against the closed-form expected cluster (chain head id), and
  * logs rounds + per-round changed counts + wall seconds for PLANS.md.
  *
  * Expected rounds: pointer jumping doubles label reach per round, so a
  * diameter-1024 chain converges in ~log2(1024) + slack rounds, well
  * under the default maxIters=20 budget.
  */
object CcScale {
  def main(args: Array[String]): Unit = {
    val chains = args.lift(0).map(_.toInt).getOrElse(1024)
    val len = args.lift(1).map(_.toInt).getOrElse(1024) // edges per chain
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Chain c owns node ids [c*(len+1), c*(len+1)+len]; one edge per
    // consecutive pair -> chains*len edges, diameter len per component.
    val stride = len + 1L
    val edges = spark.range(chains * stride)
      .filter(col("id") % stride =!= len.toLong)
      .select(col("id").as("doc_a"), (col("id") + 1L).as("doc_b"))
    var plan: Option[String] = None
    val t0 = System.nanoTime()
    var rounds = 0
    val labels = DedupOps.connectedComponents(edges, maxIters = 20,
      driverFastPathMaxEdges = 0L,
      onRound = (iter, changed, planThunk) => {
        rounds = iter + 1
        if (iter == 0) plan = Some(planThunk())
        println(s"CCSCALE round=$iter changed=$changed")
      })
    // Closed-form truth: cluster = chain head = id - id % stride.
    val wrong = labels
      .filter(col("cluster") =!= col("doc_id") - (col("doc_id") % stride))
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"CCSCALE edges=${chains.toLong * len} rounds=$rounds " +
      f"wrong=$wrong sec=$sec%.1f")
    plan.foreach(p => println("CCSCALE round-plan:\n" + p))
    assert(wrong == 0L, "distributed CC produced a wrong label")
    spark.stop()
  }
}
