package graft

import org.apache.spark.sql.functions._

import graft.catalyst.KmvSketchAgg

/** KMV (bottom-k) sketch aggregator: exactness under k, distinctness,
  * merge/partitioning invariance, and the union-closure property the
  * `sketch_kmv_distinct` gate's __ALL__ row relies on. */
class SketchSpec extends SparkSpec {

  private def kmv(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(KmvSketchAgg.kmvSketch(col("v"), k).as("sk"))
      .head.getSeq[Long](0).toSeq

  test("kmv sketch is the sorted bottom-k of the DISTINCT values") {
    import spark.implicits._
    // duplicates and shuffled order must not matter
    val vals = (1L to 100L) ++ (1L to 100L) ++ Seq(7L, 7L, 3L)
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(vals), 7)
      .toDF("v")
    assert(kmv(df, 8) == (1L to 8L))
    // under-full sketch: every distinct value, still sorted
    val small = Seq(42L, 5L, 42L, 17L).toDF("v")
    assert(kmv(small, 8) == Seq(5L, 17L, 42L))
  }

  test("kmv estimate is exact below k and within rsd bounds above") {
    import spark.implicits._
    val under = Seq.tabulate(100)(i => TestHash.h(s"v$i")).toDF("v")
      .agg(KmvSketchAgg.kmvSketch(col("v")).as("sk"))
      .select(expr(KmvSketchAgg.estimateExpr("sk")).as("est"))
      .head.getLong(0)
    assert(under == 100L)
    val n = 20000
    val est = Seq.tabulate(n)(i => TestHash.h(s"v$i")).toDF("v")
      .agg(KmvSketchAgg.kmvSketch(col("v")).as("sk"))
      .select(expr(KmvSketchAgg.estimateExpr("sk")).as("est"))
      .head.getLong(0)
    // k=256 → rsd ~ 6.3%; allow 4 sigma
    assert(math.abs(est - n) < n * 0.25, s"estimate $est vs exact $n")
  }

  test("kmv union closure: re-aggregating per-group sketch contents equals the global sketch") {
    import spark.implicits._
    val df = Seq.tabulate(5000)(i => (i % 3, TestHash.h(s"x$i"))).toDF("g", "v")
    val global = kmv(df.select(col("v")), 64)
    val merged = df.groupBy(col("g"))
      .agg(KmvSketchAgg.kmvSketch(col("v"), 64).as("sk"))
      .select(explode(col("sk")).as("v"))
    assert(kmv(merged, 64) == global)
  }
}

/** Test-only mirror of graft.ops.TextOps.hash64 on a literal string. */
object TestHash {
  def h(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
}
