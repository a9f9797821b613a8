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

  test("asofJoin plans with zero join nodes and one key shuffle") {
    val left = df(Seq(("u1", 1, "a")), ("k", "t", "tag"))
    val right = df(Seq(("u1", 1, "s")), ("k", "rt", "state"))
    val p = AsofOps.asofJoin(left, right, Seq("k"), "t", "rt", Seq("state"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one key shuffle:\n$p")
  }
}
