package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data profiling: per-column statistics for pipeline QA — the
  * check-before-you-train companion to the curation operators.
  *
  * One aggregate pass over the frame computes every column's null count,
  * exact distinct count, and min/max (stringified for a uniform schema);
  * the wide row is then melted to (column, stat rows). Exact distincts
  * shuffle per column; swap in approx_count_distinct for the
  * cardinality-only case at extreme scale.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = df.count()
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
