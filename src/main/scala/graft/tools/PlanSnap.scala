package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.Catalog

/** Round-scoped plan snapshots: writes `plans/<tag>/<query>_<suffix>.txt`
  * with the `explain("formatted")` output for each named catalog query —
  * the before/after evidence files the optimization rounds commit.
  *
  * Usage: runMain graft.tools.PlanSnap <tag> <suffix> <q1,q2,...> [sfDir]
  * e.g.   runMain graft.tools.PlanSnap r14 before sim_topk_ivf,text_bm25_query
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "PlanSnap <tag> <suffix> <q1,q2,...> [sfDir]")
    val (tag, suffix) = (args(0), args(1))
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftFunctions.register(spark)
    // Mirror Bench's shared-artifact caches so the captured plans are the
    // bench's warm-consume shapes (without these, knnEdgesCached & co.
    // plan their full inline builds — a shape the timed pass never runs).
    // Env overrides allow pointing at a pre-built dir across runs.
    def tempDir(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
    spark.conf.set("graft.knn.dir",
      sys.env.getOrElse("SPARK_GRAFT_KNN_DIR", tempDir("graft-knn")))
    spark.conf.set("graft.pairs.dir",
      sys.env.getOrElse("SPARK_GRAFT_PAIRS_DIR", tempDir("graft-pairs")))
    spark.conf.set("graft.bfs.dir",
      sys.env.getOrElse("SPARK_GRAFT_BFS_DIR", tempDir("graft-bfs")))
    spark.conf.set("graft.fixture.dir",
      sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", tempDir("graft-fixture")))
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    names.foreach { n =>
      Catalog.queries.get(n) match {
        case None => println(s"PLANSNAP unknown query: $n")
        case Some(fn) =>
          val plan = fn(spark, sfDir).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          Files.write(dir.resolve(s"${n}_$suffix.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val exchanges = "(?m)^\\(\\d+\\) (Exchange|BroadcastExchange)".r
            .findAllIn(plan).size
          println(f"PLANSNAP $n%-30s exchanges=$exchanges%2d -> $dir/${n}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
