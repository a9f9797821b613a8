package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Scale drive of the boilerplate cleaner's linear-cost claim: on the
  * gated documents table the hottest block reaches df ≈ tens, so the
  * gate never shows what a real template does — ONE block present in
  * 2^15–2^17 documents (cookie banners sit at df ~ 10^8 on a 100 TB
  * crawl). This main plants that block, times `boilerplateClean` across
  * a 4× df sweep (expected: ~flat wall-clock — the hot block costs its
  * occurrence COUNT in the df aggregation and the flag join, never
  * df²), and times the pair-join strawman (docs joined to docs sharing
  * a block — the shape naive dedup tooling reaches for) at small df
  * where its df² output is still materializable.
  */
object BoilerScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val boiler = (1 to 8).map("b" + _).mkString(" ")
    val nDocs = 1L << 18

    /** nDocs two-block docs; the first `hotDocs` carry the planted
      * boilerplate block, the rest a second unique block. */
    def corpus(hotDocs: Long) = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        when(col("id") < hotDocs, lit(boiler))
          .otherwise(concat_ws(" ",
            (1 to 8).map(i => concat(lit(s"c${i}_"), col("id"))): _*)),
        concat_ws(" ",
          (1 to 8).map(i => concat(lit(s"u${i}_"), col("id"))): _*))
        .as("text"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (hd <- Seq(1L << 15, 1L << 16, 1L << 17)) {
      val docs = corpus(hd); docs.persist(); docs.count()
      val (removed, s) = time {
        DedupOps.boilerplateClean(docs, "text", "doc_id")
          .agg(sum(col("n_removed"))).head.getLong(0)
      }
      println(f"[boilerscale] clean  df=$hd%7d removed=$removed%8d  ${s}%6.1f s")
      assert(removed == hd, s"expected $hd removed blocks, got $removed")
      docs.unpersist()
    }

    // Pair-join strawman at small df only: output IS df^2/2 rows.
    for (hd <- Seq(1L << 12, 1L << 13)) {
      val docs = corpus(hd); docs.persist(); docs.count()
      val blocks = docs
        .withColumn("__toks", graft.ops.TextOps.tokens(col("text")))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, CAST((size(__toks) + 7) div 8 AS INT) - 1),
             b -> md5(concat_ws(' ', slice(__toks, b * 8 + 1, 8))))"""))
          .as("h"))
      val (pairs, s) = time {
        blocks.as("a").join(blocks.as("b"),
            col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
          .count()
      }
      println(f"[boilerscale] pairs  df=$hd%7d pairs=$pairs%12d  ${s}%6.1f s")
      docs.unpersist()
    }
    spark.stop()
  }
}
