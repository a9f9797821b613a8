package graft

import org.apache.spark.sql.functions.{col, lit}

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

  test("dsirWeights: target-marker features upweight, off-target downweight, " +
      "clip bounds hold, empty docs get the neutral weight") {
    import spark.implicits._
    // 20 target docs all containing the marker token "alphaalpha"; 20
    // raw-only docs all containing "omegaomega"; shared filler tokens.
    // The target-marker bucket has ct=cr -> ratio ≈ (tr+B)/(tt+B) > 1;
    // the off-target bucket has ct=0 -> ratio < 1.
    val docs = ((0L until 20L).map(i => (i, "en", s"alphaalpha fill$i common")) ++
      (20L until 40L).map(i => (i, "de", s"omegaomega fill$i common")) ++
      Seq((99L, "en", null.asInstanceOf[String])))
      .toDF("doc_id", "lang", "text")
    val out = SampleOps.dsirWeights(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wTarget = out(0L)._2
    val wOff = out(20L)._2
    assert(wTarget > 1000000L, s"target weight $wTarget")
    assert(wOff < 1000000L, s"off-target weight $wOff")
    // clip bounds: every factor in [1/4x, 4x], at most 8 factors
    assert(out.values.forall { case (_, w) =>
      w >= 1000000L / 65536L && w <= 1000000L * 65536L })
    assert(out(99L) === ((0L, 1000000L))) // tokenless doc: neutral
  }

  test("waterFill: hand-solved level, saturation boundary at equality, " +
      "budget exactly consumed") {
    import spark.implicits._
    // Demands 10/20/70 tokens, B = 100 div 2 = 50.
    // k=1: 10*3=30 <= 50 ok; k=2: 20*2=40 <= 40 ok (equality);
    // k=3: 70*1=70 > 20 no. k*=2, level=(50-30)//1=20.
    // Allocs 10+20+20 = 50 = B exactly.
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(("a", words(10)), ("b", words(20)), ("c", words(70)))
      .toDF("source", "text").withColumn("doc_id", lit(1L))
    val out = SampleOps.waterFill(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out === Map(
      "a" -> ((10L, 20L, 10L, true)),
      "b" -> ((20L, 20L, 20L, true)),
      "c" -> ((70L, 20L, 20L, false))))
    assert(out.values.map(_._3).sum === 50L)
  }

  test("waterFill: NULL text contributes zero demand; all-saturated corpus " +
      "(kstar = n) yields a defined level instead of a NULL/error divide") {
    import spark.implicits._
    // One source is all-NULL text (demand 0 after the coalesce — a
    // NULL demand would sort first in Spark, last in DuckDB).
    val docs = Seq(("a", null.asInstanceOf[String]),
      ("a", null.asInstanceOf[String]), ("b", "one two three four"))
      .toDF("source", "text").withColumn("doc_id", lit(1L))
    val out = SampleOps.waterFill(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // demands 0/4, B = 2; k=1 (a): 0*2 <= 2 sat; k=2 (b): 4 > 2-0 no.
    // level = (2-0) div (2-1) = 2.
    assert(out === Map("a" -> ((0L, 2L, 0L, true)),
      "b" -> ((4L, 2L, 2L, false))))
    // All sources saturate: divisor n - kstar = 0 -> the greatest(,1)
    // guard makes level deterministic (0 here) rather than NULL.
    val all = Seq(("a", null.asInstanceOf[String]),
      ("b", null.asInstanceOf[String]))
      .toDF("source", "text").withColumn("doc_id", lit(1L))
    val sat = SampleOps.waterFill(all).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(sat.toSet === Set(("a", 0L, 0L, true), ("b", 0L, 0L, true)))
  }

  test("dsirRatioExpr survives a numerator past 2^63: DECIMAL(38,0) route " +
      "returns the exact clipped ratio where BIGINT would wrap") {
    import spark.implicits._
    // ct+1 = 2e9, tr+64 = 5e9: numerator 2e9 * 5e9 * 1e6 = 1e25 >> 2^63.
    // True ratio = 1e25 / ((4e9) * (2.5e9)) = 1e6 exactly.
    val row = Seq((1999999999L, 3999999999L, 2499999936L, 4999999936L))
      .toDF("ct", "cr", "tt", "tr")
      .selectExpr(SampleOps.dsirRatioExpr + " AS rm").collect()(0)
    assert(row.getLong(0) === 1000000L)
    // Long-wrap sanity: the unrouted product is wrapped garbage.
    assert(BigInt(2000000000L * 5000000000L * 1000000L) !==
      BigInt(2000000000L) * BigInt(5000000000L) * BigInt(1000000L))
    // clip still binds at the edges through the decimal route
    val hi = Seq((1000000L, 0L, 0L, 1000000L)).toDF("ct", "cr", "tt", "tr")
      .selectExpr(SampleOps.dsirRatioExpr + " AS rm").collect()(0)
    assert(hi.getLong(0) === SampleOps.DsirClipHi)
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

  test("leakSafeSplit: near-dup pair stays together where a doc-grain split would leak") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val salt = graft.queries.SampleQueries.Salt
    // Planted ids (verified against the md5 bucket function): with salt
    // graft-r2, bucket(2) = 7081 (train side) and bucket(29) >= 9000
    // (val side) — a doc-grain 90/10 split WOULD separate this pair.
    val b = Seq(2L, 29L).toDF("id")
      .select(SampleOps.sampleBucket(col("id"), salt).as("b"))
      .collect().map(_.getLong(0))
    assert(b(0) < 9000 && b(1) >= 9000,
      s"planted ids no longer straddle the doc-grain boundary: ${b.toSeq}")
    val docs = Seq(
      (2L, "en", "alpha beta gamma delta"),
      (29L, "en", "alpha beta gamma delta prime"), // near-dup of 2
      (0L, "en", "unrelated text one"),            // singleton, train side
      (41L, "fr", "autre texte ici"))              // singleton, val side
      .toDF("doc_id", "lang", "text")
    val pairs = Seq((2L, 29L)).toDF("doc_a", "doc_b")
    val clusters = Seq((2L, 2L), (29L, 2L)).toDF("doc_id", "cluster")
    val out = SampleOps.leakSafeSplit(docs, pairs, clusters, "lang", salt,
        trainBuckets = 9000)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(4))).toMap
    // Both members of the pair take cluster 2's bucket -> BOTH train;
    // en-train counts docs 0, 2, 29; fr-val counts doc 41. No crossing
    // pairs anywhere.
    assert(out(("train", "en"))._1 === 3L)
    assert(out(("val", "fr"))._1 === 1L)
    assert(out.size === 2)
    assert(out.values.forall(_._2 === 0L), "leaked_pairs must be 0")
    // Sanity: splitting by DOC id instead does leak this pair.
    val docGrain = SampleOps.leakSafeSplit(docs, pairs,
        clusters.filter(lit(false)), "lang", salt, trainBuckets = 9000)
      .collect().map(_.getLong(4)).toSet
    assert(docGrain === Set(1L),
      "doc-grain split should report exactly the planted crossing pair")
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

  test("prioritySample: weight-proportional selection, HT estimator, small-group degeneracy") {
    import spark.implicits._
    // 900 light (w=1) + 100 heavy (w=100) rows: heavy mass is ~92% of
    // the total, so the top-8 should be dominated by heavy rows.
    val rows = (0L until 1000L).map(i =>
      (i, if (i % 10 == 0) 100L else 1L, "g")).toDF("id", "w", "grp")
    val out = SampleOps.prioritySample(rows, "id", "w", "grp", "t1", 8)
      .collect()
    assert(out.length == 8)
    assert(out.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 8))
    val heavy = out.count(_.getAs[Long]("weight") == 100L)
    assert(heavy >= 6, s"expected heavy-dominated sample, got $heavy/8")
    // HT estimate of the total weight from 8 rows: true total is 10800;
    // the estimator is unbiased with rsd ~ 1/sqrt(k-1) — accept a wide
    // deterministic band (the draw is fixed by the salt).
    val est = out.map(_.getAs[Double]("est_contrib")).sum
    assert(est > 10800 * 0.4 && est < 10800 * 2.5, s"HT estimate $est")
    // determinism under repartitioning
    val out2 = SampleOps.prioritySample(rows.repartition(7), "id", "w",
      "grp", "t1", 8).collect()
    assert(out.map(r => (r.getAs[Long]("id"), r.getAs[Int]("rank"))).toSet ==
      out2.map(r => (r.getAs[Long]("id"), r.getAs[Int]("rank"))).toSet)
    // group smaller than k: everything sampled, no threshold, contrib = w
    val tiny = Seq((1L, 5L, "t"), (2L, 7L, "t")).toDF("id", "w", "grp")
    val touts = SampleOps.prioritySample(tiny, "id", "w", "grp", "t1", 8)
      .collect()
    assert(touts.length == 2)
    assert(touts.forall(r =>
      r.getAs[Double]("est_contrib") == r.getAs[Long]("weight").toDouble))
  }

  test("paretoFront: bucket-pruned skyline equals brute dominance; " +
      "equal points both survive") {
    import spark.implicits._
    // (o1 = tokens, o2 = ttr permille):
    //   d1 "a b c"    → (3, 1000)  dominated by d3/d5 (4, 1000)
    //   d2 "a a b b"  → (4,  500)  dominated by d3/d5
    //   d3 "a b c d"  → (4, 1000)  skyline (tied with d5 — both stay)
    //   d4 "a a"      → (2,  500)  dominated
    //   d5 "p q r s"  → (4, 1000)  skyline
    //   d6 "a a b b c c x y" → (8, 750) skyline (longest; lower ttr)
    val docs = Seq(
      (1L, "a b c"), (2L, "a a b b"), (3L, "a b c d"),
      (4L, "a a"), (5L, "p q r s"), (6L, "a a b b c c x y")
    ).toDF("doc_id", "text")
    // bucketW=2 forces the multi-bucket path (buckets 1, 2, 4).
    val got = SampleOps.paretoFront(docs, bucketW = 2)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(3L, 5L, 6L))
  }
}
