package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling: per-column statistics for pipeline QA — the
  * check-before-you-train companion to the curation operators.
  *
  * One aggregate pass over the frame computes the row count and every
  * column's null count, distinct count, and min/max (stringified for a
  * uniform schema); the wide row is then melted to (column, stat) rows.
  *
  * [[profile]] uses exact `count_distinct` — N exact distincts in one agg
  * expand the input ~N-fold (Catalyst's Expand), the right trade at
  * QA/sample scale. [[profileApprox]] swaps in HyperLogLog
  * `approx_count_distinct` (no Expand, one pass, fixed-size sketches) —
  * the 100 TB path when cardinalities only need to be right to ~2%.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = profileWith(df, c => count_distinct(col(c)))

  def profileApprox(df: DataFrame, rsd: Double = 0.02): DataFrame =
    profileWith(df, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, distinct: String => Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    // row count folded into the same aggregate — a separate df.count()
    // would re-execute the whole upstream
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        distinct(c).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__total")
    cols.map { c =>
      (c,
        total,
        row.getAs[Long](s"__nulls_$c"),
        row.getAs[Long](s"__distinct_$c"),
        Option(row.getAs[String](s"__min_$c")).orNull,
        Option(row.getAs[String](s"__max_$c")).orNull)
    }.toDF("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }

  /** Equi-width histogram of a numeric column over [lo, hi): `bins` equal
    * buckets, under/overflow clamped into the edge buckets (the standard
    * profiling histogram; pair with [[Percentiles]] for equi-DEPTH cuts).
    *
    * 100 TB shape: one narrow scan computes the bin id per row, then ONE
    * partial-agged groupBy over at most `bins` keys — the shuffle carries
    * (bins x partitions) partial rows, never the corpus. Bin arithmetic is
    * `floor((v - lo) / width)` in doubles, identical expression order on
    * any IEEE engine (DuckDB twin: the same formula verbatim). Empty bins
    * are absent from the output (generate a scaffold downstream if a dense
    * vector is needed). Output: (bin long, lo_edge double, n long); null
    * values are dropped.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val width = (hi - lo) / bins
    val bin = least(greatest(
      floor((col(valueCol).cast("double") - lo) / width).cast("long"),
      lit(0L)), lit(bins - 1L))
    df.filter(col(valueCol).isNotNull)
      .select(bin.as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), (lit(lo) + col("bin") * width).as("lo_edge"),
        col("n"))
  }
}
