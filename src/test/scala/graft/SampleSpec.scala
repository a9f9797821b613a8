package graft

import org.apache.spark.sql.functions.col

import graft.ops.SampleOps

class SampleSpec extends SparkSpec {

  test("hashSample is deterministic, partition-invariant, salt-sensitive") {
    import spark.implicits._
    val df1 = (0L until 1000L).toDF("id")
    val df8 = (0L until 1000L).toDF("id").repartition(8)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    val a = ids(SampleOps.hashSample(df1, "id", 3000, "s"))
    val b = ids(SampleOps.hashSample(df8, "id", 3000, "s"))
    assert(a === b) // partition layout must not change the sample
    assert(math.abs(a.size - 300) < 60) // ~30%
    val c = ids(SampleOps.hashSample(df1, "id", 3000, "other-salt"))
    assert(a !== c) // salt selects a different stable sample
  }

  test("stratifiedSample applies per-stratum rates; unlisted strata drop") {
    import spark.implicits._
    val df = (0L until 3000L)
      .map(i => (i, Seq("a", "b", "c")(i.toInt % 3)))
      .toDF("id", "cls")
    val kept = SampleOps.stratifiedSample(
        df, "id", "cls", Seq("a" -> 10000, "b" -> 2000), "s")
      .groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") === 1000)            // rate 10000/10000 keeps all
    assert(!kept.contains("c"))           // unlisted stratum dropped
    assert(kept("b") > 100 && kept("b") < 300) // ~20% of 1000
  }

  test("temperatureRates: exact integer thresholds, cap saturates small domains") {
    import spark.implicits._
    // a: 4 docs, b: 16 docs, budget 10.
    // s_a = floor(2·1e6) = 2e6, s_b = 4e6, S = 6e6
    // rate_a = (1e5 · 2e6) div (6e6 · 4)  = 8333
    // rate_b = (1e5 · 4e6) div (6e6 · 16) = 4166
    val df = ((0 until 4).map(i => (i.toLong, "a")) ++
      (10 until 26).map(i => (i.toLong, "b"))).toDF("id", "dom")
    val rates = SampleOps.temperatureRates(df, col("dom"), target = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rates("a") === 8333L && rates("b") === 4166L)
    // Tiny domain with a big budget: rate caps at 10000 (kept whole).
    val capped = SampleOps.temperatureRates(df, col("dom"), target = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(capped("a") === 10000L)
  }

  test("curriculum phases are equi-depth, score-monotone, and total") {
    val out = Catalog.queries("pipeline_curriculum")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.nonEmpty)
    assert(out.forall { case (_, _, p) => p >= 1 && p <= 10 })
    // equal scores share a phase; higher score -> lower-or-equal phase
    val byScore = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byScore.values.forall(_.size === 1))
    val ordered = byScore.toSeq.sortBy(-_._1).map(_._2.head)
    assert(ordered === ordered.sorted)
    // best score lands in phase 1; roughly a tenth of docs per phase
    assert(ordered.head === 1)
    val sizes = out.groupBy(_._3).view.mapValues(_.size)
    assert(sizes.values.forall(n => n > out.length / 20 && n < out.length / 5))
  }
}
