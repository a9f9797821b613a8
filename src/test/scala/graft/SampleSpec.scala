package graft

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
}
