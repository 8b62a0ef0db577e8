package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{EventAnalytics, Temporal}

/** Flagship composition #8: the "user 360" rollup — one row per user
  * joining the event-analytics operators this engine gates individually:
  * session structure (x100), lifetime value, funnel depth (x60), and the
  * bot/scraper regularity flag (x97). This is the table a growth/trust
  * team actually serves; each ingredient is a verified operator, so the
  * composition's oracle (e8) just replays the proven fragments.
  *
  * 100 TB shape: every stage keys by the user (sessionize's window, the
  * funnel's collect_list, the regularity lag window, the value groupBy),
  * so the composition is a chain of user-keyed shuffles + shuffle_hash
  * user joins — no broadcast of any user-sized frame, no driver state.
  * Users below the funnel's step set or the regularity minimum keep
  * their row (left joins; depth 0 / regular false).
  */
object UserProfile {

  def run(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, valueCol: String,
      steps: Seq[String], gapSeconds: Long = 1800L): DataFrame = {
    val dec = DecimalType(18, 6)
    val sessions = Temporal.sessionFeatures(
        events, userCol, tsCol, tieCol, gapSeconds, valueCol)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
    val value = events.groupBy(col(userCol))
      .agg(sum(col(valueCol).cast(dec)).as("__sv"))
      .select(col(userCol),
        col("__sv").cast("string").cast("double").as("total_value"))
    val depth = EventAnalytics.funnel(events, userCol, typeCol, tsCol, steps)
      .select(col(userCol), col("steps_completed"))
    val reg = EventAnalytics.gapRegularity(events, userCol, tsCol, tieCol)
      .select(col(userCol), col("regular"))
    sessions
      .join(value.hint("shuffle_hash"), Seq(userCol))
      .join(depth.hint("shuffle_hash"), Seq(userCol), "left")
      .join(reg.hint("shuffle_hash"), Seq(userCol), "left")
      .select(col(userCol), col("n_sessions"), col("n_events"),
        col("total_value"),
        coalesce(col("steps_completed"), lit(0L)).as("steps_completed"),
        coalesce(col("regular"), lit(false)).as("regular"))
  }
}
