package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, TsOps}

/** Hand-computed fixtures for the time-series diagnostics
  * (autocorrelation panel, CUSUM shift scan), the modularity panel,
  * and the l-diversity invariant over the k-anonymity ladder. */
class TsPrivacySpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("autocorr: linear series gives r=1 at lags 1-2, NULL at n=1 lag") {
    import spark.implicits._
    // One user, series 1,2,3,4 (milli 1000..4000). Lag 1 pairs
    // (2,1),(3,2),(4,3) and lag 2 pairs (3,1),(4,2) are perfectly
    // linear -> r = 1.0 exactly. Lag 3 has the single pair (4,1):
    // zero variance -> 0/0 -> NULL (both engines).
    val ev = Seq.tabulate(4)(i => (7L, ts(i + 1), i.toLong, (i + 1) * 1000L))
      .toDF("user_id", "ts", "event_id", "vm")
    val out = TsOps.autocorr(ev).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), if (r.isNullAt(7)) None else Some(r.getDouble(7))))
      .toMap
    assert(out(1) === ((3L, Some(1.0))))
    assert(out(2) === ((2L, Some(1.0))))
    assert(out(3) === ((1L, None)))
  }

  test("autocorr: pairs never cross a user boundary") {
    import spark.implicits._
    // Two users with 2 readings each: only ONE lag-1 pair per user,
    // no lag-2/3 rows at all. A cross-user pair would add a third
    // lag-1 pair or produce lag-2 rows.
    val ev = Seq((1L, ts(1), 0L, 1000L), (1L, ts(2), 1L, 2000L),
        (2L, ts(3), 2L, 5000L), (2L, ts(4), 3L, 6000L))
      .toDF("user_id", "ts", "event_id", "vm")
    val out = TsOps.autocorr(ev).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(1 -> 2L))
  }

  test("theilSen: outlier-immune median slope; negative slopes floor") {
    import spark.implicits._
    // User 1: 10,20,30,1000,50 (milli). The 1000 outlier leaves the
    // median of the 10 pairwise slopes at exactly 10e6 micro/step
    // (slopes sorted: -950e6, 10e6 x6, 330e6, 490e6, 970e6; lower
    // median = rank 5 of 10). OLS would report ~ +150/step.
    // User 4: 0,9,9,-1 -> sorted slopes -10e6, -5e6, -333334, 0,
    // 4.5e6, 9e6; rank (6+1) div 2 = 3 -> -333334, which is
    // floor(-1e6/3): truncation toward zero would give -333333.
    // User 9: a single reading -> no pairs -> no output row.
    val ev =
      (Seq(10L, 20L, 30L, 1000L, 50L).zipWithIndex.map { case (v, i) =>
        (1L, ts(i + 1), i.toLong, v) } ++
       Seq(0L, 9L, 9L, -1L).zipWithIndex.map { case (v, i) =>
        (4L, ts(i + 1), 100L + i, v) } ++
       Seq((9L, ts(1), 200L, 42L)))
        .toDF("user_id", "ts", "event_id", "vm")
    val out = TsOps.theilSen(ev, window = 16).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      1L -> ((5L, 10L, 10000000L)),
      4L -> ((4L, 6L, -333334L))))
  }

  test("theilSen: trailing window keeps only the newest readings") {
    import spark.implicits._
    // 6 readings, window 4: the two oldest (slope-breaking values)
    // must be excluded; the kept tail 1,2,3,4 has every pair slope
    // exactly 1e6.
    val ev = Seq(900L, -900L, 1L, 2L, 3L, 4L).zipWithIndex.map {
      case (v, i) => (1L, ts(i + 1), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "vm")
    val out = TsOps.theilSen(ev, window = 4).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 6L, 1000000L)))
  }

  test("cusum: mid-series step shift is flagged at its change point") {
    import spark.implicits._
    // values 0,0,0,0,10,10,10,10 (milli): mean 5000, devs -5000 x4 then
    // +5000 x4, S = -5000,-10000,-15000,-20000,-15000,-10000,-5000,0.
    // Peak |S| = 20000 at event 3 (the last pre-shift row), total
    // abs-dev mass 40000, threshold 40000 div 4 = 10000 -> flagged.
    val shift = Seq.tabulate(8)(i =>
      (1L, ts(i + 1), i.toLong, if (i < 4) 0L else 10000L))
    // Alternating 10,0,10,0: mean 5000, S = 5000,0,5000,0 -> peak 5000
    // at the FIRST row (tie -> earliest), mass 20000, threshold 5000,
    // 5000 > 5000 is false -> not flagged.
    val noise = Seq.tabulate(4)(i =>
      (2L, ts(i + 1), (10 + i).toLong, if (i % 2 == 0) 10000L else 0L))
    val out = TsOps.cusum((shift ++ noise)
        .toDF("user_id", "ts", "event_id", "vm"), 4)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))
      .toMap
    assert(out(1L) === ((8L, 5000L, -20000L, 3L, true)))
    assert(out(2L) === ((4L, 5000L, 5000L, 10L, false)))
  }

  test("cusum: negative milli-sum mean FLOORS (DuckDB // parity), " +
    "not truncates") {
    import spark.implicits._
    // values -1, -1, -1 (milli): sum -3, n 2... use sum -3 over n 2:
    // values -1 and -2: sum -3, floor(-3/2) = -2 (truncation gives -1).
    // devs: -1-(-2)=1, -2-(-2)=0; S = 1, 1; mass 1; peak at first row.
    val out = TsOps.cusum(Seq(
        (9L, ts(1), 0L, -1L), (9L, ts(2), 1L, -2L))
        .toDF("user_id", "ts", "event_id", "vm"), 4)
      .collect().head
    assert(out.getLong(2) === -2L)   // floored mean, engine-parity
    assert(out.getLong(3) === 1L)    // peak S under the floored mean
  }

  test("sax: step series symbolizes low->high, constant series is all-'a'") {
    import spark.implicits._
    // user 1: 4 low readings (0) then 4 high (1000): segLen=4 gives PAA
    // [0, 1000]; equal-width 4 bins over [0,1000] -> buckets 0 and 3.
    // user 2: constant 500 -> vmax-vmin+1 = 1, all buckets 0.
    val ev = ((0 until 8).map(i =>
        (1L, ts(i), i.toLong, if (i < 4) 0L else 1000L)) ++
      (0 until 8).map(i => (2L, ts(i), 100L + i, 500L)))
      .toDF("user_id", "tsc", "event_id", "vm")
      .select(col("user_id"), col("tsc").as("ts"), col("event_id"), col("vm"))
    val out = TsOps.sax(ev, segLen = 4, alpha = 4)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out(1L) === "ad", s"words: $out")
    assert(out(2L) === "aa", s"words: $out")
  }

  test("sax: negative PAA means floor like DuckDB //, partial tail segment kept") {
    import spark.implicits._
    // 3 readings with segLen=2: seg0 = (-3 + -4) = -7 over 2 -> floor
    // -4 (truncation would give -3); seg1 is the 1-reading tail (6).
    // Range [-4, 6]: width 11; buckets: (-4 - -4)*4 // 11 = 0 -> 'a';
    // (6 - -4)*4 // 11 = 40 // 11 = 3 -> 'd'.
    val ev = Seq((1L, ts(0), 0L, -3L), (1L, ts(1), 1L, -4L),
        (1L, ts(2), 2L, 6L))
      .toDF("user_id", "ts", "event_id", "vm")
    val row = TsOps.sax(ev, segLen = 2, alpha = 4).collect()(0)
    assert(row.getLong(2) === 2L) // n_segments
    assert(row.getString(5) === "ad", s"word: ${row.getString(5)}")
  }

  test("randomized-response estimator: estimates sum to n (floor slack) " +
      "and land inside the 3-sigma bound on gate data") {
    val s = spark
    val out = graft.Catalog.queries("pipeline_rr_frequency")(
      s, "/root/testdata/sf0.001").collect()
    val n = out.map(_.getLong(1)).sum // true_n sums to corpus size
    val estSum = out.map(_.getLong(3)).sum
    // Σ est = (Σobs·1000 − K·n·50)·4/3 = 1000·n exactly pre-floor;
    // flooring loses at most 1 per category.
    assert(math.abs(estSum - 1000L * n) <= out.length,
      s"est sum $estSum vs ${1000L * n}")
    assert(out.forall(_.getBoolean(5)), // in_bound pinned TRUE
      s"out of bound: ${out.mkString(", ")}")
  }

  test("dtwTopK: hand-checked banded alignment beats Euclidean, " +
      "constant series ranks by diagonal cost, self excluded") {
    import spark.implicits._
    import graft.ops.TsOps
    // segLen=1 -> PAA = raw milli readings. u0 = 1..8 (query, 0%50=0);
    // u1 = (1,2,3,5,5,6,7,9): DTW=|4-5|+|8-9| = 2000 milli (diagonal
    // with two unit substitutions; warping can't beat it); u2 = all-10:
    // diagonal sum |i-10| = 44 -> 44000.
    val ev = (1 to 8).flatMap { i =>
      Seq((0L, i.toLong, i.toLong, i.toDouble),
        (1L, i.toLong, i.toLong,
          Seq(1d, 2d, 3d, 5d, 5d, 6d, 7d, 9d)(i - 1)),
        (2L, i.toLong, i.toLong, 10d))
    }.toDF("user_id", "ts", "event_id", "value")
    val out = TsOps.dtwTopK(ev, segLen = 1, w = 8, band = 2,
        queryMod = 50, topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === Map(
      (0L, 1L) -> ((1L, 2000L)),
      (0L, 2L) -> ((2L, 44000L))))
  }

  test("dtwTopKPruned: certified LB_Keogh pruning returns exactly the " +
      "brute top-k and actually prunes on gate data") {
    import graft.ops.TsOps
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val brute = TsOps.dtwTopK(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val out = TsOps.dtwTopKPruned(ev).collect()
    assert(out.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      === brute)
    val nTotal = TsOps.paaVectors(ev, 5, 8).count() - 1 // candidates/query
    assert(out.forall(r => r.getLong(4) >= 3 && r.getLong(4) <= nTotal))
  }

  test("matrixProfile: planted motif found at distance 0 outside the " +
      "exclusion zone; linear series motif is the slope-distance pair") {
    import spark.implicits._
    import graft.ops.TsOps
    // u1: 1..8 planted at pos 0 and pos 11 (gap 11 >= m=8) -> dist 0.
    val s1 = Seq(1, 2, 3, 4, 5, 6, 7, 8, 50, 60, 70,
      1, 2, 3, 4, 5, 6, 7, 8, 90)
    // u2: strict ramp 1..20: subsequences at gap g differ by g at every
    // cell -> dist = 8*(1000g)^2, minimized at the exclusion boundary
    // g=8 -> 512e6; tie-break smallest pa -> (0, 8).
    val s2 = 1 to 20
    val ev = (s1.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong, v.toDouble) } ++
      s2.zipWithIndex.map { case (v, i) =>
        (2L, i.toLong, i.toLong, v.toDouble) })
      .toDF("user_id", "ts", "event_id", "value")
    val out = TsOps.matrixProfile(ev, m = 8).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((15L, 0L, 11L, 0L)))
    assert(out(2L) === ((15L, 0L, 8L, 512000000L)))
  }

  test("matrixProfile STOMP recurrence equals the definitional all-pairs " +
      "brute on LCG series; banded variant equals brute under the horizon") {
    import spark.implicits._
    import graft.ops.TsOps
    val m = 8
    val h = 16
    // Three deterministic LCG series of different lengths (incl. one
    // shorter than 2m to exercise the empty-profile edge).
    val series = Map(
      1L -> Iterator.iterate(7L)(x => (x * 1103515245L + 12345L)
        % 1000L).take(60).toVector,
      2L -> Iterator.iterate(311L)(x => (x * 1103515245L + 12345L)
        % 997L).take(37).toVector,
      3L -> Iterator.iterate(5L)(x => (x * 6364136223846793005L
        + 1442695040888963407L).abs % 500L).take(12).toVector)
    val ev = series.toSeq.flatMap { case (u, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        (u, i.toLong, i.toLong, v.toDouble) }
    }.toDF("user_id", "ts", "event_id", "value")
    // Scala brute reference over milli-quantized values.
    def brute(maxGap: Long): Map[Long, (Long, Long, Long, Long)] =
      series.flatMap { case (u, vs) =>
        val x = vs.map(v => math.floor(v * 1000d + 0.5).toLong)
        val n = x.length
        val pairs = for {
          pa <- 0 to n - 2 * m; pb <- (pa + m) to (n - m)
          if pb - pa <= maxGap
        } yield {
          val d = (0 until m).map(j =>
            (x(pa + j) - x(pb + j)) * (x(pa + j) - x(pb + j))).sum
          (d, pa.toLong, pb.toLong)
        }
        if (pairs.isEmpty) None
        else {
          val best = pairs.min
          Some(u -> ((pairs.size.toLong, best._2, best._3, best._1)))
        }
      }
    def got(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(TsOps.matrixProfile(ev, m)) === brute(Long.MaxValue))
    assert(got(TsOps.matrixProfileBanded(ev, m, h)) === brute(h))
    // u3 (length 12 < 2m) has no non-overlapping pair on either arm.
    assert(!got(TsOps.matrixProfile(ev, m)).contains(3L))
  }

  test("dtwTopKPruned: far-away candidates are LB-pruned before the DP") {
    import spark.implicits._
    import graft.ops.TsOps
    // Query u0 = 1..8; u50 identical (dtw 0 -> tau 0); u1..u3 constant
    // 100/200/300 -> LB >> 0, provably outside tau, never DP-scored.
    val ev = (1 to 8).flatMap { i =>
      Seq((0L, i.toLong, i.toLong, i.toDouble),
        (50L, i.toLong, i.toLong, i.toDouble),
        (1L, i.toLong, i.toLong, 100d),
        (2L, i.toLong, i.toLong, 200d),
        (3L, i.toLong, i.toLong, 300d))
    }.toDF("user_id", "ts", "event_id", "value")
    // queryMod=50 -> queries {0, 50}; each has the identical twin at
    // dtw 0, so tau = 0 and the three constants prune away: n_scored=1.
    val out = TsOps.dtwTopKPruned(ev, segLen = 1, w = 8, band = 2,
        queryMod = 50, topK = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out === Map(0L -> ((50L, 0L, 1L)), 50L -> ((0L, 0L, 1L))))
  }

  test("hampel: a spike flags against the rolling median even when it " +
      "sits INSIDE its own window (no masking); constant windows use " +
      "the MAD = 0 degenerate rule; edge windows take the lower median") {
    import spark.implicits._
    import graft.ops.TsOps
    // u1: constant 10s with one 100 spike at pos 3. Every window median
    // is 10 (the spike cannot drag it), MAD = 0, so only the spike's
    // own nonzero deviation fires (0 > 0 is false for the rest).
    val s1 = Seq(10d, 10d, 10d, 100d, 10d, 10d, 10d)
    // u2: gentle noise — MAD = 1000 milli at the center, and the
    // largest deviation (2000 micro-milli·1e4 = 2e7) stays under
    // 44478·1000 = 4.45e7: nothing flags.
    val s2 = Seq(10d, 12d, 11d, 13d, 11d, 12d, 10d)
    val ev = (s1.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong, v) } ++
      s2.zipWithIndex.map { case (v, i) => (2L, i.toLong, i.toLong, v) })
      .toDF("user_id", "ts", "event_id", "value")
    val out = TsOps.hampel(ev, w = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out((1L, 3L)) === ((10000L, 0L, true))) // the spike
    (0L to 6L).filter(_ != 3L).foreach { p =>
      assert(out((1L, p))._3 === false, s"u1 pos $p")
      assert(out((1L, p))._1 === 10000L) // median never dragged
    }
    (0L to 6L).foreach(p => assert(out((2L, p))._3 === false, s"u2 pos $p"))
    // lower-median at an even-sized edge window: u1 pos 0 sees
    // [10,10,10,100] -> med = sorted[(4+1) div 2 = 2] = 10.
    assert(out((1L, 0L))._1 === 10000L)
    assert(out((2L, 3L))._2 === 1000L) // center MAD hand-checked
  }

  test("dtwTopKAdaptive: below the candidate threshold it IS brute " +
      "(LB pass skipped, n_scored = all candidates); above it IS the " +
      "certified-pruned arm — results identical either way") {
    import spark.implicits._
    import graft.ops.TsOps
    val ev = (1 to 8).flatMap { i =>
      Seq((0L, i.toLong, i.toLong, i.toDouble),
        (50L, i.toLong, i.toLong, i.toDouble),
        (1L, i.toLong, i.toLong, 100d),
        (2L, i.toLong, i.toLong, 200d),
        (3L, i.toLong, i.toLong, 300d))
    }.toDF("user_id", "ts", "event_id", "value")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // 4 candidates/query < 512 -> brute arm: same top-k as dtwTopK,
    // n_scored = ALL candidates (published either way).
    val small = rows(TsOps.dtwTopKAdaptive(ev, segLen = 1, w = 8,
      band = 2, queryMod = 50, topK = 1, lbMinCandidates = 512))
    val brute = TsOps.dtwTopK(ev, segLen = 1, w = 8, band = 2,
        queryMod = 50, topK = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        4L)).toSet
    assert(small === brute)
    // threshold 1 -> the certified-pruned arm verbatim (n_scored = 1
    // per query on this fixture: the identical twin seeds tau = 0).
    val big = rows(TsOps.dtwTopKAdaptive(ev, segLen = 1, w = 8,
      band = 2, queryMod = 50, topK = 1, lbMinCandidates = 1))
    val pruned = rows(TsOps.dtwTopKPruned(ev, segLen = 1, w = 8,
      band = 2, queryMod = 50, topK = 1))
    assert(big === pruned)
    // the two arms agree on the ranked pairs (exactness theorem)
    assert(small.map(t => (t._1, t._2, t._3, t._4)) ===
      big.map(t => (t._1, t._2, t._3, t._4)))
  }

  test("geoNoise: exact truncated two-sided geometric masses over the " +
      "full coin space, zero mean") {
    import graft.ops.SampleOps
    // Enumerate EVERY coin value 0..3*2^20-1: branch masses must equal
    // the theoretical alpha=1/2 geometric exactly — P(0)=2^20,
    // P(+-k)=2^(20-k) for k=1..9, truncation mass 2048 at +-10.
    val counts = spark.range(SampleOps.GeoMod)
      .select(SampleOps.geoNoise(col("id")).as("d"))
      .groupBy("d").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(0L) === (1L << 20))
    for (k <- 1 to 9) {
      assert(counts(k.toLong) === (1L << (20 - k)), s"mass at +$k")
      assert(counts(-k.toLong) === (1L << (20 - k)), s"mass at -$k")
    }
    assert(counts(10L) === 2048L && counts(-10L) === 2048L)
    assert(counts.keySet.size === 21)
    assert(counts.map { case (d, n) => d * n }.sum === 0L)
  }

  test("lm filter: exact terciles, kept == top band, score order " +
      "respected across bands, scoreless docs dropped") {
    val out = graft.Catalog.queries("pipeline_lm_filter")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 500)
    val byBand = out.groupBy(_.getLong(2))
    assert(byBand.keySet === Set(0L, 1L, 2L))
    val sizes = byBand.view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(out.forall(r => r.getBoolean(3) === (r.getLong(2) == 2L)))
    def key(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(1)) -1d else r.getDouble(1)
    val b0max = byBand(0L).map(key).max
    val b1 = byBand(1L).map(key)
    val b2min = byBand(2L).map(key).min
    assert(b0max <= b1.min && b1.max <= b2min)
    assert(out.filter(_.isNullAt(1)).forall(_.getLong(2) == 0L))
  }

  test("tree-DP continual release: n_nodes is popcount(t), every release " +
      "recomputes exactly from the scalar twins, bound holds") {
    import graft.ops.{SampleOps, TextOps}
    val out = graft.Catalog.queries("stream_tree_dp")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 500) // one release per arrival
    out.foreach { r =>
      val (qi, t, n, rel, ok) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(n === java.lang.Long.bitCount(t).toLong, s"popcount at t=$t")
      val noise = (0 until 63).filter(b => ((t >> b) & 1L) == 1L).map { b =>
        val u = TextOps.hash64Scalar(s"$qi|$b|${t >> b}") % SampleOps.GeoMod
        SampleOps.geoNoiseScalar(u)
      }.sum
      assert(rel === t + noise, s"release at ($qi, $t)")
      assert(ok === (math.abs(noise) <= 10 * n))
      assert(ok, s"bound violated at ($qi, $t)")
      // the batch row must agree with the streaming twin's pure form
      val tw = graft.streaming.StatefulOps.treeRelease(qi, t)
      assert((tw.nNodes, tw.releasedN) === ((n, rel)))
    }
  }

  test("tree-DP at the 2^20 edge: a count whose set bits all sit above " +
      "bit 19 still gets a noised release on BOTH twins") {
    import graft.ops.{SampleOps, TextOps}
    import graft.streaming.StatefulOps
    // t = 2^20: a 20-bit cap would explode an EMPTY bit list (batch
    // row dropped) and release the exact unnoised count live.
    for (t <- Seq(1L << 20, 3L << 20, 1L << 45, (1L << 62) + (1L << 21))) {
      val bits = (0 until 63).filter(b => ((t >> b) & 1L) == 1L)
      assert(bits.nonEmpty)
      // batch side: the gate's exact filter/sequence expression
      val arr = (0 until 63).map(1L << _).mkString("array(", "L, ", "L)")
      val got = spark.sql(
        s"""SELECT filter(sequence(0, 62),
              b -> (${t}L div element_at($arr, b + 1)) % 2 = 1) AS bits""")
        .collect()(0).getSeq[Int](0)
      assert(got === bits, s"batch bit walk at t=$t")
      // streaming side: one node per set bit, release = t + Σ noises
      val rel = StatefulOps.treeRelease("en", t)
      val noise = bits.map { b =>
        val u = TextOps.hash64Scalar(s"en|$b|${t >> b}") % SampleOps.GeoMod
        SampleOps.geoNoiseScalar(u)
      }.sum
      assert(rel.nNodes === bits.length.toLong)
      assert(rel.releasedN === t + noise)
    }
  }

  test("scalar twins match their Column versions: hash64 on strings, " +
      "geoNoise at every branch boundary") {
    import spark.implicits._
    import graft.ops.{SampleOps, TextOps}
    val strs = Seq("en#1", "de#64", "zh#1024", "", "a b c", "geoen")
    val colVals = strs.toDF("s")
      .select(TextOps.hash64(col("s"))).collect().map(_.getLong(0))
    assert(strs.map(TextOps.hash64Scalar).zip(colVals)
      .forall { case (a, b) => a == b })
    // every cumulative boundary +-1 plus the ends
    val widths = Seq(1L << 20) ++ (1 to 10).flatMap { k =>
      val w = if (k == 10) 2048L else 1L << (20 - k); Seq(w, w)
    }
    val bounds = widths.scanLeft(0L)(_ + _)
    val probes = (bounds.flatMap(b => Seq(b - 1, b, b + 1)) ++
      Seq(0L, SampleOps.GeoMod - 1)).filter(u =>
      u >= 0 && u < SampleOps.GeoMod).distinct
    val colNoise = probes.toDF("u")
      .select(col("u"), SampleOps.geoNoise(col("u"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.foreach { u =>
      assert(SampleOps.geoNoiseScalar(u) === colNoise(u), s"u=$u")
    }
  }

  test("personalizedPageRank: hand-derived 3 rounds on a path, teleport " +
      "only at the seed") {
    import spark.implicits._
    import graft.ops.GraphOps
    // Path 0<->1<->2, seed {0}. od: 0->1, 1->2, 2->1.
    // r0 = (1e12, 0, 0); base = 0.15e12 at the seed only.
    // r1 = (150e9, 850e9, 0)
    // r2 = (511.25e9, 127.5e9, 361.25e9)
    // r3 = (204.1875e9, 741.625e9, 54.1875e9)
    val nodes = Seq(0L, 1L, 2L).toDF("node_id")
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val out = GraphOps.personalizedPageRank(nodes, edges,
        col("node_id") === 0L).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(out(0L) === ((true, 204187500000L)))
    assert(out(1L) === ((false, 741625000000L)))
    assert(out(2L) === ((false, 54187500000L)))
  }

  test("louvainRounds: hand-traced 2 synchronous rounds on two " +
      "triangles + bridge, isolated node untouched") {
    import spark.implicits._
    import graft.ops.GraphOps
    // Triangles {0,1,2}, {3,4,5}, bridge 2-3 (given once; op
    // symmetrizes). deg = (2,2,3,3,2,2), 2m = 14.
    // Round 1 (singletons, score = 14·e − deg_v·deg_u):
    //   0→1, 1→0, 2→0 (tie 8 at {0,1} → asc), 3→4, 4→5, 5→4.
    // Round 2 (labels {0:{1,2}, 1:{0}, 4:{3,5}, 5:{4}}):
    //   0→0 (28−2·5=18 vs stay 0, gain 18000//14 = 1285)
    //   1→1 (10 vs stay 8, gain 142);  2 stays 0 (tie 8, asc, gain 0)
    //   3 stays 4 (tie 8, asc);  4→4 (18 vs 0, gain 1285)
    //   5→5 (10 vs stay 8, gain 142).  Node 6 isolated: own label.
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L).toDF("node_id")
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L),
      (3L, 5L), (2L, 3L)).toDF("src", "dst")
    val out = GraphOps.louvainRounds(nodes, edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      0L -> ((0L, 1285L)), 1L -> ((1L, 142L)), 2L -> ((0L, 0L)),
      3L -> ((4L, 0L)), 4L -> ((4L, 1285L)), 5L -> ((5L, 142L)),
      6L -> ((6L, 0L))))
  }

  test("modularity: two triangles + bridge, unlabeled node excluded") {
    import spark.implicits._
    // Directed triangles {0,1,2} and {3,4,5}, bridge 2->3; node 6 is
    // UNLABELED with edges both ways to node 0 — those edges must not
    // count anywhere (m stays 7). Labeled m=7:
    //   A={0,1,2}: e_within=3, out=4 (3 cycle + bridge), in=3
    //     q_A = 3e6 div 7 - (4*3*1e6) div 49 = 428571 - 244897 = 183674
    //   B={3,4,5}: e_within=3, out=3, in=4 (bridge lands here)
    //     q_B = 428571 - 244897 = 183674
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
        (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L),
        (6L, 0L), (0L, 6L))
      .toDF("src", "dst")
    val labels = Seq((0L, Some(0L)), (1L, Some(0L)), (2L, Some(0L)),
        (3L, Some(3L)), (4L, Some(3L)), (5L, Some(3L)), (6L, None))
      .toDF("node_id", "label")
    val out = GraphOps.modularity(labels, edges).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))
      .toMap
    assert(out(0L) === ((3L, 3L, 4L, 3L, 183674L)))
    assert(out(3L) === ((3L, 3L, 3L, 4L, 183674L)))
  }

  test("l-diversity gate: published classes are k-anonymous and the " +
      "verdict matches the distinct count") {
    val out = Catalog.queries("pipeline_l_diversity")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (kLevel, size, lDist, verdict) =
        (r.getInt(0), r.getLong(2), r.getLong(3), r.getBoolean(4))
      // The ladder invariant carries over: every PUBLISHED class
      // (k_level < 3) the audit sees has at least k members.
      if (kLevel < 3) assert(size >= queries.PipelineQueries.KAnon, r)
      // 16-way sensitive proxy: distinct count is bounded and the
      // verdict is exactly the threshold compare.
      assert(lDist >= 1L && lDist <= 16L)
      assert(verdict === (lDist >= queries.PipelineQueries.LDiv))
    }
  }

  test("holt: hand-derived level/trend recursion, init l1=x1 b1=0") {
    import spark.implicits._
    // Series 1, 5, 3 (α = β = 1/4):
    //   init    l=1,      b=0
    //   x=5:    l=5/4+3/4       = 2.0
    //           b=(2−1)/4+0     = 0.25
    //   x=3:    l=3/4+2.25·3/4  = 2.4375
    //           b=(2.4375−2)/4+0.25·3/4 = 0.296875
    // forecast = 2.734375; quant4 → 2.4375 / 0.2969 / 2.7344.
    val ev = Seq((1L, 10L, 0L, 1.0), (1L, 20L, 1L, 5.0),
      (1L, 30L, 2L, 3.0)).toDF("user_id", "sec", "event_id", "value")
    val r = TsOps.holt(ev).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 3L)
    assert(r(0).getDouble(2) === 2.4375)
    assert(r(0).getDouble(3) === 0.2969)
    assert(r(0).getDouble(4) === 2.7344)
  }

  test("t-closeness gate: EMD is bounded, zero only for global-shaped " +
      "classes, and the verdict is the threshold compare") {
    val out = Catalog.queries("pipeline_t_closeness")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (tMicro, verdict) = (r.getLong(3), r.getBoolean(4))
      // EMD with unit ground distance over micro probabilities is in
      // [0, 10^6]; the verdict is exactly the threshold compare.
      assert(tMicro >= 0L && tMicro <= 1000000L, r)
      assert(verdict === (tMicro <= queries.PipelineQueries.TClose), r)
    }
    // The whole-corpus distribution compared against itself must read
    // t = 0: that is what a single all-docs class would publish, and
    // the suppressed/level-2 classes that aggregate most of the corpus
    // must sit well below a concentrated class. Sanity floor: at least
    // one class is NOT distribution-identical to the corpus.
    assert(out.exists(_.getLong(3) > 0L))
  }
}
