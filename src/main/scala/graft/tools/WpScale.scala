package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Scale drive of the WordPiece apply's DISTINCT-WORD shape: the gated
  * plan tokenizes each distinct word once (Heaps-law-bounded frame,
  * O(distinct × fold)) and joins tokens back to occurrences, versus the
  * naive per-occurrence plan that runs the greedy fold on every word
  * OCCURRENCE (O(occurrences × fold) — the shape a 100 TB corpus
  * cannot afford: occurrences grow linearly with the corpus while
  * distinct words grow ~n^0.5). Both shapes must produce identical
  * doc rows — asserted via full-row checksums.
  *
  * The corpus is the documents table REPLICATED `reps` times with
  * shifted doc ids: occurrences scale by the factor, the distinct-word
  * set stays FIXED, so the dedup shape's fold cost should stay flat
  * while the naive shape's grows with the factor.
  *
  * Usage: runMain graft.tools.WpScale [sfDir] [maxReps]
  * (default sf0.01, reps 1,2,4..maxReps, maxReps 8). */
object WpScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxReps = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftFunctions.register(spark)
    val base = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nBase = base.count()
    // The replica shift must clear every base doc_id or replicas
    // collide and corrupt the asserted checksums (fine for the sf*
    // defaults, guarded for caller-supplied corpora).
    val maxId = base.agg(max(col("doc_id"))).collect()(0).getLong(0)
    require(maxId < 10000000L,
      s"WpScale replica shift 1e7 would collide: max doc_id $maxId")
    def corpus(reps: Int): DataFrame =
      (0 until reps).map(r => base.select(
        (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
        col("text"))).reduce(_ unionAll _).localCheckpoint()
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def checksum(df: DataFrame): Long =
      df.agg(expr("CAST(bit_xor(hash(doc_id, n_words, n_pieces, n_unk," +
          " doc_fp)) AS BIGINT)"))
        .collect()(0).getLong(0)
    println("WPSCALE reps    docs  dedup_s  naive_s  (checksums asserted)")
    var reps = 1
    while (reps <= maxReps) {
      val c = corpus(reps)
      c.count()
      val (s1, tDedup) = time(checksum(TextOps.wordPiece(c)))
      val (s2, tNaive) = time(checksum(TextOps.wordPieceNaive(c)))
      assert(s1 == s2, s"shapes diverge at reps=$reps: $s1 vs $s2")
      println(f"WPSCALE $reps%4d ${nBase * reps}%7d $tDedup%8.2f $tNaive%8.2f")
      reps *= 2
    }
    spark.stop()
  }
}
