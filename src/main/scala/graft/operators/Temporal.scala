package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins. Spark has no ASOF JOIN operator; per the custom-operator
  * preference order, this composes built-ins instead of adding a planner
  * strategy: both sides are unioned into one keyed event stream, sorted by
  * (time, right-before-left), and a running `last(..., ignoreNulls)` window
  * carries the most recent right-side payload onto each left row.
  *
  * Scale shape: ONE shuffle on the join key; per-key windows (never a
  * global sort); no time-range explosion — cost is |left| + |right|, not
  * |left| x |right| like a naive range join.
  */
object Temporal {

  /** Backward as-of join: for each left row, attach the latest right row
    * with rightTs <= leftTs and equal key (inclusive; ties on the right
    * side must be pre-deduplicated by the caller for determinism). Right
    * columns come back null when no prior right row exists — LEFT OUTER
    * semantics, matching `ASOF LEFT JOIN` in engines that have it.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPrefix: String = ""): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.filterNot(c => c == rightKey || c == rightTs).toSeq

    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(right.select(rightCols.map(col): _*).schema
        .foldLeft(new org.apache.spark.sql.types.StructType)((s, f) => s.add(f)))
        .as("__r"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(left.select(leftCols.map(col): _*).schema
        .foldLeft(new org.apache.spark.sql.types.StructType)((s, f) => s.add(f)))
        .as("__l"),
      struct(rightCols.map(col): _*).as("__r"))

    // right rows sort BEFORE left rows at equal timestamps => inclusive <=
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftOut = leftCols.map(c => col(s"__l.$c").as(c))
    val rightOut = rightCols.map(c => col(s"__match.$c").as(s"$rightPrefix$c"))
    carried.select(leftOut ++ rightOut: _*)
  }
}
