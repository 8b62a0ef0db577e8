package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The per-row error channel.
  *
  * The reference throws exceptions per row and the phase catches them
  * (/root/reference/phaser/phase.py:84-106); Spark tasks are all-or-nothing,
  * so instead every row carries `__graft_events__`, an
  * `array<struct<etype,step,message,policy>>`. Compiled column checks and
  * steps append to it with `when(...)` guards, the phase routes the events
  * to the context's event log at the phase boundary, and policies are
  * applied there (drop rows, fail phase, ...).
  *
  * Everything here is built from codegen'd built-in expressions (`when`,
  * `array_append`, `exists`) — no UDFs in the hot path.
  */
object Events {
  /** Stable row-number column; 1-based, survives filters, assigned at
    * ingest (reference: PHASER_ROW_NUM, constants.py:2). */
  val RowNumCol = "__graft_row_num__"
  val EventsCol = "__graft_events__"

  val ErrorType = "ERROR"
  val WarningType = "WARNING"
  val DroppedType = "DROPPED_ROW"

  val eventStruct: StructType = StructType(Seq(
    StructField("etype", StringType, nullable = false),
    StructField("step", StringType, nullable = false),
    StructField("message", StringType, nullable = true),
    StructField("policy", StringType, nullable = false)))

  val schema: ArrayType = ArrayType(eventStruct, containsNull = false)

  def emptyEvents: Column = array().cast(schema)

  /** Internal columns excluded from user-facing schema operations. */
  val internalCols: Seq[String] = Seq(RowNumCol, EventsCol)

  def withEventsCol(df: DataFrame): DataFrame =
    if (df.columns.contains(EventsCol)) df
    else df.withColumn(EventsCol, emptyEvents)

  def dropInternal(df: DataFrame): DataFrame =
    df.drop(internalCols: _*)

  /** Checkpoint schema: row numbers included (reference serializes
    * PHASER_ROW_NUM into every checkpoint, records.py:102-107), event
    * channel excluded (it is reported to errors_and_warnings.txt instead). */
  def forCheckpoint(df: DataFrame): DataFrame = df.drop(EventsCol)

  /** Build one event struct. `message` may be a dynamic Column. */
  def event(etype: String, step: String, message: Column, policy: ErrorPolicy): Column =
    struct(
      lit(etype).as("etype"),
      lit(step).as("step"),
      message.as("message"),
      lit(policy.name).as("policy"))

  /** events' = if cond then events :+ event else events. For StopNow the
    * append is replaced by an immediate job failure. */
  def append(events: Column, cond: Column, etype: String, step: String,
             message: Column, policy: ErrorPolicy): Column =
    policy match {
      case ErrorPolicy.StopNow =>
        when(coalesce(cond, lit(false)),
          raise_error(concat(lit(s"[$step] "), coalesce(message, lit("error")))))
          .otherwise(events)
      case _ =>
        when(coalesce(cond, lit(false)),
          array_append(events, event(etype, step, message, policy)))
          .otherwise(events)
    }

  /** A conditional singleton event array for concat-style assembly:
    * `if cond then [event] else []`. Unlike [[append]], the accumulated
    * events column is NOT referenced, so a chain of N checks built as
    * `concat(events, term1, ..., termN)` stays linear in N — the
    * `when(cond, append(events,...)).otherwise(events)` nesting references
    * the previous layer twice and goes exponential under project-collapse.
    * StopNow keeps its fail-fast semantics (raise_error under cond). */
  def appendTerm(cond: Column, etype: String, step: String,
                 message: Column, policy: ErrorPolicy): Column =
    policy match {
      case ErrorPolicy.StopNow =>
        when(coalesce(cond, lit(false)),
          raise_error(concat(lit(s"[$step] "), coalesce(message, lit("error")))).cast(schema))
          .otherwise(emptyEvents)
      case _ =>
        when(coalesce(cond, lit(false)), array(event(etype, step, message, policy)).cast(schema))
          .otherwise(emptyEvents)
    }

  /** True if the row has any event that makes later steps skip it
    * (ERROR from Collect, or a DropRow request). Warnings don't skip. */
  def rowFailed(events: Column): Column =
    exists(events, e => e("etype") === ErrorType || e("etype") === DroppedType)

  def rowFailed(df: DataFrame): Column = rowFailed(df(EventsCol))

  /** True if the row was marked for dropping (policy drop_row). */
  def rowDropped(events: Column): Column =
    exists(events, e => e("etype") === DroppedType)

  def hasWarning(events: Column): Column =
    exists(events, e => e("etype") === WarningType)

  /** Guard a per-row transform so failed rows pass through unchanged
    * (reference: rows with errors are skipped by later steps but retained,
    * phase.py:90-91, 101-105). */
  def guarded(df: DataFrame, newValue: Column, oldValue: Column): Column =
    when(rowFailed(df(EventsCol)), oldValue).otherwise(newValue)
}
