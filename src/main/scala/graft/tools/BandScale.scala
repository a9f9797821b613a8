package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.AsofOps

/** Scale drive of the banded interval join's hot-key claim: on the gated
  * events table every user has ~2k rows, so the plain user-keyed range
  * join never shows its quadratic failure mode under the correctness
  * gate. This main plants the failure — ONE celebrity key holding
  * `hotRows` of the rows (the default 2^18 makes the plain join's hot
  * group 2^36 raw pairs) spread uniformly over a `spanDays` window, plus
  * uniform background users — then times the banded (user, bucket)
  * equi-join against the plain key-equi + range-filter join on the SAME
  * data and verifies both produce the identical pair count.
  *
  * Expected: the banded join's hot groups hold only one tolerance
  * window's rows each (density-bounded: rows/bucket ≈ hotRows·tol/span),
  * so its pair work is Σ per-bucket², ~tol/span of the plain join's
  * hot-group² — the difference grows linearly with key popularity, which
  * is exactly the "last reducer" curve a 100 TB feed cannot survive.
  */
object BandScale {
  def main(args: Array[String]): Unit = {
    val hotRows = args.lift(0).map(_.toLong).getOrElse(1L << 17)
    val bgUsers = args.lift(1).map(_.toLong).getOrElse(256L)
    val perBg = args.lift(2).map(_.toLong).getOrElse(1024L)
    val tol = 600L
    val span = 30L * 86400L // 30 days of hot-key traffic
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // Model the 100 TB regime where NEITHER side broadcasts: a
      // broadcast of the left would parallelize the hot group over right
      // partitions and mask the single-reducer pathology this drive
      // exists to measure.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Deterministic event times: hot user 0 gets hotRows rows hashed
    // uniformly over span; background users get perBg rows each.
    val hot = spark.range(hotRows).select(
      lit(0L).as("user_id"),
      pmod(hash(col("id")).cast("long"), lit(span)).as("es"),
      col("id").as("event_id"))
    val bg = spark.range(bgUsers * perBg).select(
      (col("id") % bgUsers + 1L).as("user_id"),
      pmod(hash(col("id") + 7L).cast("long"), lit(span)).as("es"),
      (col("id") + (1L << 40)).as("event_id"))
    val ev = hot.unionAll(bg)
      .select(col("user_id"), timestamp_seconds(col("es")).as("ts"),
        col("event_id"))
    ev.persist(); val n = ev.count()

    // Left side: a deterministic 1/64 sample of events (the "high" rows).
    val left = ev.filter(pmod(hash(col("event_id")), lit(64)) === 0)
      .select(col("user_id"), col("ts"), col("event_id").as("h_id"))
    left.persist(); val nl = left.count()
    println(s"BANDSCALE rows=$n left=$nl hotRows=$hotRows tol=$tol span=$span")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"BANDSCALE $label%-8s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val banded = time("banded") {
      AsofOps.bandedIntervalJoin(left, ev.select(col("user_id"), col("ts"),
          col("event_id")), Seq("user_id"), "ts", "ts", Seq("event_id"), tol)
        .count()
    }
    val plain = time("plain") {
      val l = left.select(col("user_id").as("lu"),
        col("ts").cast("long").as("les"), col("h_id"))
      ev.join(l, col("user_id") === col("lu") &&
          abs(col("ts").cast("long") - col("les")) <= tol)
        .count()
    }
    println(s"BANDSCALE pairs banded=$banded plain=$plain equal=${banded == plain}")
    spark.stop()
    if (banded != plain) sys.exit(1)
  }
}
