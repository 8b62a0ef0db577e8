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
}
