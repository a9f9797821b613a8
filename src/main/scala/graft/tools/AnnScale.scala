package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.SimOps

/** Scale drive of the IVF-PQ composite index: the gated run
  * (`sim_topk_ivfpq`, 500 vectors at sf0.01) proves correctness, this
  * main proves the SHAPE at the scale it exists for — 2^20 synthetic
  * 64-dim vectors at local[32], c=256 coarse cells, nprobe=8, 16×64 PQ
  * codebook, shortlist 200.
  *
  * What to read off the run (recorded in PLANS.md):
  *  - wall seconds end-to-end: dominated by the index build
  *    (assignment = n·c·dim multiply-adds through codegen'd array_dot +
  *    n pq_encode calls), a one-time cost amortized across queries in a
  *    real deployment;
  *  - the per-query scan is bounded by construction: ~n·nprobe/c
  *    candidates × m byte-codes (here ~32k of 2^20 vectors ≈ 3% of the
  *    corpus), vs the full n·dim floats a brute scan reads;
  *  - every query returns exactly k rows and includes its planted
  *    near-duplicate twin at rank 1 — the recall sanity at scale.
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1L << 20)
    val dim = 64
    val (c, nprobe, m, k, shortlist, topK) = (256, 8, 16, 64, 200, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftFunctions.register(spark)
    // Deterministic pseudo-random corpus; each query vector q in [0,10)
    // has a planted near-twin at id q + n (base vector + tiny jitter on
    // one coordinate) that exact search must rank first.
    val base = spark.range(n).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(1, $dim), j -> cast(
        (xxhash64(concat(cast(id AS string), '_', cast(j AS string))) % 2001)
        / 250.0 AS float))""").as("embedding"))
    val twins = spark.range(10).select((col("id") + n).as("vec_id"),
      expr(s"""transform(sequence(1, $dim), j -> cast(
        (xxhash64(concat(cast(id AS string), '_', cast(j AS string))) % 2001)
        / 250.0 + if(j = 1, 0.001, 0.0) AS float))""").as("embedding"))
    val vecs = base.unionAll(twins)
    val t0 = System.nanoTime()
    val res = SimOps.topKIvfPq(vecs, col("vec_id") < 10, topK,
        c, nprobe, m, k, dim, shortlist)
      .collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val byQuery = res.groupBy(_.getLong(0))
    val twinAtRank1 = byQuery.count { case (q, rows) =>
      rows.exists(r => r.getInt(1) == 1 && r.getLong(2) == q + n)
    }
    println(f"ANNSCALE n=${n + 10} dim=$dim c=$c nprobe=$nprobe m=$m k=$k " +
      f"shortlist=$shortlist queries=${byQuery.size} rows=${res.length} " +
      f"twin_at_rank1=$twinAtRank1/10 sec=$sec%.1f")
    assert(byQuery.size == 10 && res.length == 10 * topK,
      "every query must return exactly topK rows")
    assert(twinAtRank1 == 10,
      "a planted near-twin must survive cell pruning + ADC shortlisting")
    spark.stop()
  }
}
