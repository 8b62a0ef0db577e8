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

  /** Sessionization: assign every event a per-key session ordinal — a new
    * session starts when the gap since the key's previous event exceeds
    * `gapSeconds`. This is the event-level twin of the session AGGREGATE
    * (`session_window`): the aggregate collapses sessions to one row;
    * this keeps every event, labeled, so downstream ops can join within
    * sessions (funnel steps, per-session sequence packing).
    *
    * Scale shape: keyed windows only (lag + running sum, one shuffle on
    * the key, never a global sort); per-key state is the window frame.
    * Gap arithmetic is exact integer MICROSECONDS (`unix_micros`, DuckDB
    * `epoch_us`) — no sub-second truncation disagreements between
    * engines. `tieCol` must make (tsCol, tieCol) unique per key so the
    * running sum's frame is a total order.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long, as: String = "session_id"): DataFrame = {
    val order = Seq(col(tsCol).asc, col(tieCol).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - prev > gapSeconds * 1000000L, 1L).otherwise(0L)
    // two projections: window functions don't nest (lag feeds the sum)
    df.withColumn("__is_new", isNew)
      .withColumn(as, sum(col("__is_new")).over(run))
      .drop("__is_new")
  }
}
