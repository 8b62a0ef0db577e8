package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Percentile estimation at three price points:
  *
  *  - [[exact]] — Spark's `percentile()` aggregate: buffers EVERY value in
  *    the aggregation buffer. Correct and oracle-friendly, but
  *    memory-unbounded — fine for a column that fits one executor's heap,
  *    a scale-killer at 100 TB. Use as the correctness baseline only.
  *  - [[approx]] — `approx_percentile` (Greenwald-Khanna sketch): one pass,
  *    fixed-size state, mergeable across partitions. The default at scale
  *    when a bounded rank error (1/accuracy) is acceptable.
  *  - [[exactSorted]] — exact order statistics the distributed way: one
  *    count, one range-partitioned sort with per-partition offsets
  *    ([[graft.plans.RowNum.assign]]-style), then a filter for the bracket
  *    rows and linear interpolation (matching `percentile()`/DuckDB
  *    `quantile_cont` semantics). Two passes over the column, bounded
  *    memory everywhere — the exact answer at any scale.
  */
object Percentiles {

  def exact(df: DataFrame, valueCol: String, ps: Seq[Double]): DataFrame = {
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      expr(s"percentile($valueCol, $p)").as(s"p$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  def approx(df: DataFrame, valueCol: String, ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      expr(s"approx_percentile($valueCol, $p, $accuracy)").as(s"p$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Exact continuous percentiles via distributed order statistics.
    * Returns one row with columns p0..p{k-1} (doubles), like [[exact]]. */
  def exactSorted(df: DataFrame, valueCol: String, ps: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("double").as("v")).filter(col("v").isNotNull)
    val n = vals.count()
    require(n > 0, s"exactSorted needs at least one non-null $valueCol")
    // continuous-percentile bracket positions (1-based): p sits between
    // floor(1+(n-1)p) and ceil(1+(n-1)p), weight = fractional part
    val brackets = ps.map { p =>
      val pos = 1.0 + (n - 1) * p
      val lo = math.floor(pos).toLong
      val hi = math.ceil(pos).toLong
      (lo, hi, pos - lo)
    }
    val needed = brackets.flatMap { case (lo, hi, _) => Seq(lo, hi) }.distinct
    val numbered = graft.plans.RowNum.assign(vals.orderBy(col("v")))
    val picked = numbered
      .filter(col(graft.plans.Events.RowNumCol).isin(needed: _*))
      .select(col(graft.plans.Events.RowNumCol).as("rk"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = brackets.map { case (lo, hi, w) =>
      picked(lo) + (picked(hi) - picked(lo)) * w
    }
    spark.createDataFrame(
      java.util.Collections.singletonList(Row.fromSeq(out)),
      org.apache.spark.sql.types.StructType(ps.indices.map(i =>
        org.apache.spark.sql.types.StructField(s"p$i",
          org.apache.spark.sql.types.DoubleType))))
  }
}
