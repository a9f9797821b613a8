package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Round-14 optimization evidence harness: times the minhashAccuracy
  * pipeline (the catalog's most subtree-re-executed plan, ~28 parquet
  * scans) under intra-query reuse strategies — none vs repartition+
  * localCheckpoint (earlier revisions also measured bare persist /
  * localCheckpoint). Verdict (sf0.1, local[32]): NONE wins warm by
  * 3-6×; every materialization variant serializes downstream stages
  * (AQE coalesces the tiny frames to one partition) or degrades across
  * passes, while codegen recompute of a small corpus stays
  * embarrassingly parallel. Kept as the measurement behind the
  * "left unmaterialized on purpose" notes in DedupOps/TextOps. */
object MatExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = graft.Tables.documents(spark, sfDir)
    // Each mat() site names its repartition key EXPLICITLY (ADVICE r14:
    // the old call-order counter silently misassigned keys if a mat()
    // call was added or reordered).
    def accuracy(mat: (DataFrame, String) => DataFrame): DataFrame = {
      val k = 16
      val sigs = mat(DedupOps.signatures(
        DedupOps.shingleInv(docs, "text", "doc_id"), k)
        .withColumn("bk", DedupOps.bandKeys(4, 4)), "doc_id")
      val buckets = sigs.select(col("doc_id"),
        posexplode(col("bk")).as(Seq("band", "key")))
      val cand = mat(buckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .dropDuplicates("doc_a", "doc_b"), "doc_a")
      val candIds = cand.select(col("doc_a").as("cid"))
        .union(cand.select(col("doc_b").as("cid"))).distinct()
      val candSets = mat(DedupOps.shingleSets(
        docs.join(candIds, col("doc_id") === col("cid"), "left_semi"),
        "text", "doc_id"), "doc_id")
      val sigA = sigs.select(
        col("doc_id").as("doc_a") +: (0 until k).map(i => col(s"m$i").as(s"a$i")): _*)
      val sigB = sigs.select(
        col("doc_id").as("doc_b") +: (0 until k).map(i => col(s"m$i").as(s"b$i")): _*)
      cand
        .join(sigA, "doc_a").join(sigB, "doc_b")
        .join(candSets.select(col("doc_id").as("doc_a"), col("sh").as("sha")),
          "doc_a")
        .join(candSets.select(col("doc_id").as("doc_b"), col("sh").as("shb")),
          "doc_b")
        .withColumn("agree",
          (0 until k).map(i => when(col(s"a$i") === col(s"b$i"), 1L)
            .otherwise(0L)).reduce(_ + _))
        .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
        .select(col("doc_a"), col("doc_b"),
          expr(s"agree * 1000 div $k").as("est_permille"),
          expr("CAST(common AS BIGINT) * 1000 div " +
            "(size(sha) + size(shb) - common)").as("exact_permille"))
    }
    // rchk = hash-repartition by the downstream join key to the session
    // default parallelism, THEN localCheckpoint — the parallelism-
    // preserving materialization variant (bare localCheckpoint freezes
    // the AQE-coalesced 1-partition layout and serializes every
    // downstream stage).
    def rchk(df: DataFrame, key: String): DataFrame =
      df.repartition(df.sparkSession.sparkContext.defaultParallelism,
        col(key)).localCheckpoint()
    val strategies: Seq[(String, (DataFrame, String) => DataFrame)] = Seq(
      ("none", (df: DataFrame, _: String) => df),
      ("rchk", rchk _))
    for (pass <- 1 to 3; (name, mat) <- strategies) {
      val secs = t(graft.Materialize(accuracy(mat)))
      println(f"MATEXP pass$pass $name%-6s $secs%7.2f s")
    }
    spark.stop()
  }
}
