package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale drive of the crawl-intake first mile: WARC record walk →
  * HTML strip (single-pass entity decode incl. the round-13 numeric
  * references) → URL canonicalization/domain roll-up. All three are
  * narrow per-row passes (the roll-up adds one slim-row agg), so the
  * per-MB rate must hold ~flat as the corpus replicates 1→16×. Each
  * rep level re-processes the SAME per-doc fixtures under shifted
  * doc_ids, and the exact-integer conservation laws (record rows,
  * Σ content_length, strip Σ n_tags, Σ n_clean, URL occurrence total
  * all ×reps) are ASSERTED — the throughput race doubles as a
  * correctness drive under executor-parallel batching.
  *
  * Usage: runMain graft.tools.IntakeScale [sfDir] [maxReps]
  * (default sf0.01, 16). */
object IntakeScale {
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
    // one frame: HTML shell + entity tail + planted URLs (the gate
    // fixtures), plus the mm_warc_records synthesis as raw bytes
    val iq = graft.queries.IndexQueries
    val docsTxt = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(lit(iq.HtmlPre), coalesce(col("text"), lit("")),
          lit(iq.HtmlPost),
          lit(" see https://ex"), col("doc_id") % 5,
          lit(".org/p/"), col("doc_id"),
          lit(" and http://WWW.Shop"), col("doc_id") % 3,
          lit(".CO.UK:80/x#f")).as("text"))
      .localCheckpoint()
    // the mm_warc_records fixture builder, SHARED with the gate so the
    // conservation baseline always measures the corpus the gate verifies
    val warcs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nc) =>
        (id, graft.queries.MultimodalQueries.warcFixtureBlob(id, nc))
      }.toDF("doc_id", "bytes").localCheckpoint()
    val baseMb = (docsTxt.select(sum(length(col("text")))).collect()(0)
      .getLong(0) +
      warcs.select(sum(length(col("bytes")))).collect()(0).getLong(0)) / 1e6
    def stats(txt: DataFrame, wc: DataFrame): (Long, Long, Long, Long, Long) = {
      val w = graft.multimodal.MultimodalOps
        .warcRecords(wc, "doc_id", "bytes").toDF()
        .agg(count(lit(1)), sum(col("contentLength"))).collect()(0)
      val h = graft.ops.TextOps.htmlStrip(txt)
        .agg(sum(col("n_tags")), sum(col("n_clean"))).collect()(0)
      val u = graft.ops.TextOps.urlDomains(txt)
        .agg(sum(col("n_urls"))).collect()(0)
      (w.getLong(0), w.getLong(1), h.getLong(0), h.getLong(1), u.getLong(0))
    }
    val b = stats(docsTxt, warcs)
    stats(docsTxt, warcs) // warm codegen/JIT before any timed row
    println("INTAKESCALE reps     MB    sec    MB/s  (conservation asserted)")
    var reps = 1
    while (reps <= maxReps) {
      def rep(df: DataFrame): DataFrame =
        (0 until reps).map(r => df.withColumn("doc_id",
          col("doc_id") + lit(r.toLong * 10000000L)))
          .reduce(_ unionAll _).localCheckpoint()
      val (t, w) = (rep(docsTxt), rep(warcs))
      val t0 = System.nanoTime()
      val s = stats(t, w)
      val sec = (System.nanoTime() - t0) / 1e9
      assert(s == ((b._1 * reps, b._2 * reps, b._3 * reps, b._4 * reps,
        b._5 * reps)),
        s"conservation broke at reps=$reps: $s vs base $b")
      println(f"INTAKESCALE $reps%4d ${baseMb * reps}%6.1f $sec%6.2f " +
        f"${baseMb * reps / sec}%7.1f")
      reps *= 4
    }
    spark.stop()
  }
}
