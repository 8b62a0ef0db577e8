package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) joins.
  *
  * Spark plans a plain `p.v >= i.lo AND p.v < i.hi` join as a broadcast
  * nested loop (fine when intervals fit in a broadcast) or, when neither
  * side is small, a cartesian product — the classic 100 TB cliff. The
  * scale path here is BUCKETING: quantize the value axis into fixed-width
  * buckets, explode each interval to the buckets it covers, and equi-join
  * on the bucket id — an ordinary shuffle hash join whose cost is
  * |points| + |intervals| x (avg interval width / step), not
  * |points| x |intervals|.
  *
  * Each point lands in exactly ONE bucket and an interval appears at most
  * once per bucket, so a matching (point, interval) pair joins exactly
  * once — no post-join dedup needed (unlike interval-interval bucketing).
  *
  * Reference has no range join (pure row pipeline); this is part of the
  * extension surface for event/log enrichment at scale.
  */
object RangeJoin {

  /** Equi-bucketed point-in-interval join: all (point, interval) pairs
    * with `lo <= point < hi`. `pointCol`, `loCol`, `hiCol` must be
    * long-typed (caller casts timestamps/doubles to a fixed-point grid
    * first — floats on a join axis invite boundary drift). `step` should
    * be on the order of the median interval width: too small explodes the
    * interval side, too large degrades bucket selectivity (both only cost
    * time, never correctness).
    *
    * Inner-join semantics: unmatched points drop. `joinType = "left"`
    * keeps them (nulls on the interval side) — implemented as the inner
    * bucket join plus an anti-join union so the bucketed plan stays
    * equi-keyed.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      step: Long, joinType: String = "inner"): DataFrame = {
    require(step > 0, s"step must be positive: $step")
    require(joinType == "inner" || joinType == "left",
      s"intervalJoin supports inner/left; got '$joinType'")
    // all-integer floor division: (c - pmod(c, step)) is the exact floor
    // multiple of step (pmod is non-negative, so this floors rather than
    // truncating toward zero for negative values), and `div` is Catalyst's
    // IntegralDivide — true long division, exact for any long. Column./
    // would be DOUBLE division (loses ulps past 2^53 — epoch micros get
    // there) and only stayed correct incidentally via bucket monotonicity.
    def bucketOf(c: Column): Column =
      call_function("div", c - pmod(c, lit(step)), lit(step))

    val p = points.withColumn("__graft_bucket__", bucketOf(col(pointCol)))
    // empty intervals (hi <= lo) match nothing; sequence() would throw on
    // a descending range, so guard them out instead
    val iv = intervals.filter(col(hiCol) > col(loCol))
      // hi is EXCLUSIVE: a hi landing exactly on a bucket boundary
      // contributes nothing to that bucket, hence (hi - 1)
      .withColumn("__graft_bucket__",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol) - 1))))

    // shuffle_hash: the whole point is to avoid BNL/cartesian; post-explode
    // size estimates are unreliable so don't let AQE pick a broadcast of
    // the exploded side either
    val inner = p.join(iv.hint("shuffle_hash"), Seq("__graft_bucket__"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__graft_bucket__")

    if (joinType == "inner") inner
    else {
      val ivCols = intervals.columns.toSeq
      val matched = inner
      val unmatched = p.drop("__graft_bucket__")
        .join(matched.select(points.columns.map(col): _*).distinct(),
          points.columns.toSeq, "left_anti")
      val withNulls = ivCols.foldLeft(unmatched) { (d, c) =>
        d.withColumn(c, lit(null).cast(intervals.schema(c).dataType))
      }
      matched.unionByName(withNulls)
    }
  }
}
