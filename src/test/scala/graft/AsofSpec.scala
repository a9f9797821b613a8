package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofOps

class AsofSpec extends SparkSpec {

  private def df(rows: Seq[(String, Int, String)], cols: (String, String, String)) = {
    import spark.implicits._
    rows.toDF(cols._1, cols._2, cols._3)
  }

  test("asofJoin: latest at-or-before match per key, inclusive, null before first") {
    val left = df(Seq(
      ("u1", 5, "a"), ("u1", 10, "b"), ("u1", 20, "c"),
      ("u2", 10, "d")), ("k", "t", "tag"))
    val right = df(Seq(
      ("u1", 10, "r10"), ("u1", 15, "r15"),
      ("u2", 99, "r99")), ("k", "rt", "state"))
    val out = AsofOps.asofJoin(left, right, Seq("k"), "t", "rt", Seq("state"))
      .select("k", "t", "tag", "asof_state").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(out === Set(
      ("u1", 5, "a", null),     // before any right row
      ("u1", 10, "b", "r10"),   // inclusive: state at t=10 visible at t=10
      ("u1", 20, "c", "r15"),   // latest at-or-before, not first
      ("u2", 10, "d", null)))   // keys are isolated (u2's state is later)
  }

  test("asofJoinNearest: closest match either direction, backward wins ties") {
    val left = df(Seq(
      ("u1", 5, "a"), ("u1", 10, "b"), ("u1", 12, "c"),
      ("u1", 20, "d"), ("u1", 28, "e"), ("u2", 7, "f")),
      ("k", "t", "tag"))
    val right = df(Seq(
      ("u1", 10, "r10"), ("u1", 14, "r14"), ("u1", 26, "r26")),
      ("k", "rt", "state"))
    val out = AsofOps.asofJoinNearest(left, right, Seq("k"), "t", "rt",
        Seq("state"))
      .select("k", "t", "tag", "asof_state").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    assert(out === Set(
      ("u1", 5, "a", "r10"),   // only a forward candidate
      ("u1", 10, "b", "r10"),  // exact hit: backward by the inclusive rule
      ("u1", 12, "c", "r10"),  // 2 back vs 2 forward: backward wins the tie
      ("u1", 20, "d", "r14"),  // 6 back vs 6 forward: backward wins again
      ("u1", 28, "e", "r26"),  // only a backward candidate
      ("u2", 7, "f", null)))   // keys isolated, no u2 right rows
  }

  test("asofJoinTolerance: stale matches null out, fresh and exact survive") {
    val left = df(Seq(
      ("u1", 5, "a"), ("u1", 10, "b"), ("u1", 30, "c"),
      ("u1", 100, "d")), ("k", "t", "tag"))
    val right = df(Seq(
      ("u1", 10, "r10"), ("u1", 25, "r25")), ("k", "rt", "state"))
    val out = AsofOps.asofJoinTolerance(left, right, Seq("k"), "t", "rt",
        Seq("rt", "state"), toleranceSec = 20L)
      .select("k", "t", "tag", "asof_state").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    assert(out === Set(
      ("u1", 5, "a", null),     // no backward match at all
      ("u1", 10, "b", "r10"),   // exact hit: staleness 0
      ("u1", 30, "c", "r25"),   // 5s stale, inside the 20s tolerance
      ("u1", 100, "d", null)))  // match exists (r25) but 75s stale
  }

  test("asofJoinTolerance nulls ONLY its own asof_ payload — a left column named asof_* survives") {
    import spark.implicits._
    // Left frame carries a pre-existing column whose name starts with
    // asof_ (e.g. output of an earlier as-of pass): the staleness filter
    // must null exactly the payload columns THIS join produced, never
    // prefix-match the left frame's columns.
    val left = Seq(("u1", 100, "keepme")).toDF("k", "t", "asof_note")
    val right = Seq(("u1", 10, "r10")).toDF("k", "rt", "state")
    val row = AsofOps.asofJoinTolerance(left, right, Seq("k"), "t", "rt",
        Seq("rt", "state"), toleranceSec = 20L)
      .select("k", "t", "asof_note", "asof_state").collect().head
    assert(row.getString(3) == null,   // 90s stale: this join's payload nulls
      "stale payload must null")
    assert(row.getString(2) === "keepme",
      "left-frame asof_* column must pass through untouched")
  }

  test("asofJoin plans with zero join nodes and one key shuffle") {
    val left = df(Seq(("u1", 1, "a")), ("k", "t", "tag"))
    val right = df(Seq(("u1", 1, "s")), ("k", "rt", "state"))
    val p = AsofOps.asofJoin(left, right, Seq("k"), "t", "rt", Seq("state"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one key shuffle:\n$p")
  }

  test("bandedIntervalJoin equals the naive range join, boundaries inclusive") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // Seconds chosen so pairs land exactly ON ±tolerance, straddle bucket
    // edges, and include a hot key with many rows in one window.
    val tol = 60L
    val lRows = (0 until 40).map(i =>
      (if (i % 3 == 0) "hot" else s"u${i % 5}",
        1000L + rnd.nextInt(400).toLong, s"L$i"))
    val rRows = (0 until 60).map(i =>
      (if (i % 2 == 0) "hot" else s"u${i % 5}",
        1000L + rnd.nextInt(400).toLong, i.toLong)) ++
      // exact-boundary probes against L0's time
      Seq(("hot", lRows.head._2 - tol, 900L), ("hot", lRows.head._2 + tol, 901L))
    val left = lRows.toDF("k", "t", "tag")
    val right = rRows.toDF("k", "rt", "rid")
    val banded = AsofOps.bandedIntervalJoin(left, right, Seq("k"), "t", "rt",
        Seq("rid"), tol)
      .select("k", "t", "tag", "r_rid", "delta_s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val naive = lRows.flatMap { case (lk, lt, tag) =>
      rRows.collect { case (rk, rt, rid)
        if rk == lk && math.abs(rt - lt) <= tol => (lk, lt, tag, rid, rt - lt) }
    }
    assert(banded.sorted.toSeq === naive.sorted.toSeq)
    // Each qualifying pair appears exactly once (no bucket-overlap dups).
    assert(banded.length === banded.distinct.length)
    // The boundary probes at exactly ±tol matched.
    assert(banded.exists(r => r._4 == 900L && r._5 == -tol))
    assert(banded.exists(r => r._4 == 901L && r._5 == tol))
  }
}
