package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{DedupOps, TextOps}

/** Measures what the PPJoin positional upper-bound filter buys
  * [[DedupOps.prefixFilterPairs]]: candidate pairs surviving the prefix +
  * length filters alone (the pre-round-8 verify-join input) vs after the
  * positional filter, plus the final pair count both must preserve — the
  * filter is complete by theorem, so the ONLY legal change is a smaller
  * verify join. Run at sf0.1 (arg 0 overrides). */
object PpjoinScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (tNum, tDen) = (3L, 5L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val toks = DedupOps.shingleInv(docs, "text", "doc_id").distinct()
      .localCheckpoint()
    val dfreq = toks.groupBy("h").agg(count(lit(1)).as("df"))
    val sized = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val prefix = toks.join(dfreq, "h")
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("h"))))
      .join(sized, "doc_id")
      .filter(col("pos") <= col("n") -
        expr(s"($tNum * n + ${tDen - 1}) div $tDen") + 1)
      .select(col("doc_id"), col("h"), col("df"), col("pos"), col("n"))
      .localCheckpoint()
    val joined = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id") &&
        lit(tNum) * col("a.n") <= lit(tDen) * col("b.n") &&
        lit(tNum) * col("b.n") <= lit(tDen) * col("a.n"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"),
        col("a.df").as("df"), col("a.h").as("h"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    val grouped = joined
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(min_by(struct(col("pa"), col("pb")),
        struct(col("df"), col("h"))).as("fp"))
      .localCheckpoint()
    val before = grouped.count()
    val after = grouped
      .filter((lit(1) +
        least(col("na") - col("fp.pa"), col("nb") - col("fp.pb"))) *
        lit(tNum + tDen) >= lit(tNum) * (col("na") + col("nb")))
      .count()
    val finalPairs =
      DedupOps.prefixFilterPairs(docs, "text", "doc_id", tNum, tDen).count()
    println(f"PPJOIN sf=$sfDir candidates_prefix_only=$before " +
      f"candidates_positional=$after " +
      f"pruned=${100.0 * (before - after) / math.max(1, before)}%.1f%% " +
      f"final_pairs=$finalPairs")
    spark.stop()
  }
}
