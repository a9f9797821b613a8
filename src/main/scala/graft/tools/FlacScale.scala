package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale drive of the FLAC decode path: [[graft.multimodal.MultimodalOps
  * .decodeFlacChannels]] is a narrow partition-batched map (blobs never
  * shuffle), so wall time must scale ~linearly with corpus size and the
  * per-MB rate must hold flat as the corpus replicates 1→16×. Each rep
  * level re-decodes the SAME per-doc streams under shifted doc_ids, so
  * the exact-integer conservation laws (row count, Σ n_samples,
  * Σ sum_squares, Σ zero_crossings all ×reps) are ASSERTED — the
  * throughput race doubles as a correctness drive of the decoder under
  * executor-parallel batching.
  *
  * Usage: runMain graft.tools.FlacScale [sfDir] [maxReps]
  * (default sf0.01, 16). */
object FlacScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxReps = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // the mm_flac_decode synthesis, materialized once
    val base = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nc) =>
        val n = ((nc % 130) + 8).toInt
        val al = (id % 500 + 1).toInt
        val ar = (nc % 300 + 1).toInt
        val samples = Array.tabulate(2 * n)(i =>
          (if (i % 2 == 0) { if ((i / 2) % 2 == 0) al else -al }
           else ar).toShort)
        val mode = (id % 4) match {
          case 0 => graft.multimodal.FlacCodec.ChIndep
          case 1 => graft.multimodal.FlacCodec.ChLeftSide
          case 2 => graft.multimodal.FlacCodec.ChRightSide
          case _ => graft.multimodal.FlacCodec.ChMidSide
        }
        (id, graft.multimodal.FlacCodec.buildFlac(
          (8000 + (id % 3) * 4000).toInt, 2, samples,
          blockSize = 64, assignment = mode))
      }.toDF("doc_id", "bytes").localCheckpoint()
    val baseMb = base.select(sum(length(col("bytes")))).collect()(0)
      .getLong(0) / 1e6
    def stats(df: DataFrame): (Long, Long, Long, Long) = {
      val r = graft.multimodal.MultimodalOps
        .decodeFlacChannels(df, "doc_id", "bytes").toDF()
        .agg(count(lit(1)), sum(col("nSamples")), sum(col("sumSquares")),
          sum(col("zeroCrossings"))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val b = stats(base)
    stats(base) // warm codegen/JIT before any timed row
    println("FLACSCALE reps     MB    sec    MB/s  (conservation asserted)")
    var reps = 1
    while (reps <= maxReps) {
      val corpus = (0 until reps).map(r => base.select(
        (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
        col("bytes"))).reduce(_ unionAll _).localCheckpoint()
      val t0 = System.nanoTime()
      val s = stats(corpus)
      val sec = (System.nanoTime() - t0) / 1e9
      assert(s == ((b._1 * reps, b._2 * reps, b._3 * reps, b._4 * reps)),
        s"conservation broke at reps=$reps: $s vs base $b")
      println(f"FLACSCALE $reps%4d ${baseMb * reps}%6.1f $sec%6.2f " +
        f"${baseMb * reps / sec}%7.1f")
      reps *= 4
    }
    spark.stop()
  }
}
