package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Equi-bucketed point-in-interval join vs the naive range predicate. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, -15L), (2L, -10L), (3L, -1L), (4L, 0L), (5L, 7L), (6L, 10L),
    (7L, 19L), (8L, 20L), (9L, 99L), (10L, 100L), (11L, 250L)
  ).toDF("pid", "v")

  // overlapping, boundary-touching, negative-spanning, and empty intervals
  private def intervals = Seq(
    (100L, -10L, 0L),   // negative lo, hi on a bucket boundary (exclusive)
    (101L, 0L, 20L),    // starts at 0, spans two buckets (step 10)
    (102L, 5L, 8L),     // sub-bucket interval
    (103L, 15L, 15L),   // empty (hi == lo): matches nothing
    (104L, 90L, 101L),  // spans the 100 boundary
    (105L, 18L, 22L)    // overlaps 101
  ).toDF("iid", "lo", "hi")

  private def naive = points.join(intervals,
      col("v") >= col("lo") && col("v") < col("hi"))
    .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("inner intervalJoin equals the naive range predicate, exactly once per pair") {
    val got = RangeJoin.intervalJoin(points, intervals, "v", "lo", "hi", step = 10)
      .select("pid", "iid").as[(Long, Long)].collect().toList
    assert(got.toSet == naive)
    assert(got.size == got.toSet.size, "a (point, interval) pair joined twice")
    // spot-check boundary semantics: v = -10 matches [ -10, 0 ); v = 0 does not
    assert(naive.contains((2L, 100L)) && !naive.contains((4L, 100L)))
    // v = 20 excluded from [0,20) but included in [18,22)
    assert(!naive.contains((8L, 101L)) && naive.contains((8L, 105L)))
  }

  test("left intervalJoin keeps unmatched points with null interval side") {
    val out = RangeJoin.intervalJoin(points, intervals, "v", "lo", "hi",
      step = 10, joinType = "left")
    val matchedPairs = out.filter(col("iid").isNotNull)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(matchedPairs == naive)
    val unmatched = out.filter(col("iid").isNull)
      .select("pid").as[Long].collect().toSet
    val matchedPids = naive.map(_._1)
    assert(unmatched == points.as[(Long, Long)].collect().map(_._1).toSet -- matchedPids)
    assert(out.count() == naive.size + unmatched.size)
  }

  test("step size never changes the result (only the plan cost)") {
    val r1 = RangeJoin.intervalJoin(points, intervals, "v", "lo", "hi", step = 1)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val r1000 = RangeJoin.intervalJoin(points, intervals, "v", "lo", "hi", step = 1000)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(r1 == naive && r1000 == naive)
  }

  test("bucketed plan is an equi shuffle join, not BNL/cartesian") {
    val plan = RangeJoin.intervalJoin(points, intervals, "v", "lo", "hi", step = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi plan:\n$plan")
  }
}
