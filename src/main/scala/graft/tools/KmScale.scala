package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.SimOps

/** Scale drive of exact-integer Lloyd k-means: the gated run
  * (`sim_kmeans`, 2000 vectors at sf0.1) proves correctness, this main
  * proves the SHAPE at the scale it exists for — 2^20 synthetic 64-dim
  * vectors at local[32], k=16 clusters, 2 Lloyd rounds, with 16 planted
  * well-separated blobs the trained centroids must recover.
  *
  * What to read off the run (recorded in PLANS.md):
  *  - wall seconds: dominated by the per-round assignment map (n·k·dim
  *    integer multiply-adds through the HOF pipeline) and the slim
  *    (cluster, dim) update shuffle — there is no quadratic or
  *    corpus-shuffling term anywhere, so time scales linearly in n;
  *  - the Lloyd contract at scale: the clustering is a PARTITION of the
  *    corpus (sizes sum to n) and two rounds never increase total
  *    inertia vs the raw hash-sampled seeds (hash-sampled init can seed
  *    one blob twice — k-means converges locally, it does not promise
  *    blob recovery; that honesty is the same reason the gated query
  *    pins summaries, not semantic labels);
  *  - driver memory: k·dim longs per round (the CC/BPE iteration
  *    pattern), independent of n.
  */
object KmScale {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1L << 20)
    val dim = 64
    val k = 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 16 planted blobs: blob b lives at coordinate offset 10·b with a
    // deterministic per-row jitter of ±0.01 on one coordinate.
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(1, $dim), j -> cast(
        (id % $k) * 10.0
        + if(j = 1 + cast(id % $dim AS int),
             if(id % 2 = 0, 0.01, -0.01), 0.0) AS float))""").as("embedding"))
    val t0 = System.nanoTime()
    val out = SimOps.kmeans(vecs, k = k, rounds = 2, dim = dim).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val seed = SimOps.kmeans(vecs, k = k, rounds = 0, dim = dim)
      .agg(sum("inertia")).collect()(0).getDouble(0)
    val sizes = out.map(_.getAs[Long]("n")).sorted
    val inertia = out.map(_.getAs[Double]("inertia")).sum
    println(f"KMSCALE n=$n dim=$dim k=$k rounds=2 clusters=${out.length} " +
      f"sizes_min=${sizes.head} sizes_max=${sizes.last} " +
      f"inertia=$inertia%.4f seed_inertia=$seed%.4f sec=$sec%.1f")
    assert(sizes.sum == n, "clustering must partition the corpus")
    assert(inertia <= seed, "Lloyd rounds must not increase inertia")
    spark.stop()
  }
}
