package graft.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.operators.{EventAnalytics, Experiment}

/** END-TO-END experiment readout — the analysis a growth team actually
  * ships after an A/B test, composed from the engine's gated stages:
  *
  *  1. guardrail: [[Experiment.srmCheck]] — the worst per-segment
  *     sample-ratio chi-square (an SRM hit invalidates everything below);
  *  2. mean readout: [[EventAnalytics.cupedAdjust]] — raw and
  *     variance-reduced means per arm with the reduction ratio;
  *  3. robustness: [[Experiment.mannWhitney]] — the rank test that
  *     survives heavy tails;
  *  4. distribution: [[Experiment.quantileTreatment]] — p25/p50/p75
  *     effects the mean hides.
  *
  * Output: one long-format row per metric — (metric, arm0, arm1, delta),
  * arm columns NULL for the single-statistic rows (mw_z, srm_chi2_max).
  * Deterministic end to end (hash arms, integer metrics, round-6
  * convention), so the whole readout is oracle-replayable as one SQL
  * statement.
  *
  * 100 TB shape: each stage is its own partial-agged reduction of the
  * event scan (documented per operator); the assembly crosses only
  * broadcast 1-row frames. A production run would persist the shared
  * per-user frame; the flagship keeps the gated operators' interfaces
  * intact instead.
  */
object ExperimentReadout {

  def run(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, cutoff: String,
      segmentCol: String): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val dnull = lit(null).cast(DoubleType)

    val cuped = EventAnalytics.cupedAdjust(events, userCol, tsCol,
      valueCol, cutoff, arms = 2)
    val a0 = cuped.filter(col("arm") === 0).select(
      col("n_users").as("n0"), col("mean_y").as("my0"),
      col("mean_y_adj").as("ma0"), col("var_reduction").as("vr0"))
    val a1 = cuped.filter(col("arm") === 1).select(
      col("n_users").as("n1"), col("mean_y").as("my1"),
      col("mean_y_adj").as("ma1"), col("var_reduction").as("vr1"))
    val meanRows = a0.crossJoin(broadcast(a1)).select(explode(array(
        struct(lit("mean_y").as("metric"), col("my0").as("arm0"),
          col("my1").as("arm1"),
          round(col("my1") - col("my0"), 6).as("delta")),
        struct(lit("mean_y_adj").as("metric"), col("ma0").as("arm0"),
          col("ma1").as("arm1"),
          round(col("ma1") - col("ma0"), 6).as("delta")),
        struct(lit("n_users").as("metric"), d(col("n0")).as("arm0"),
          d(col("n1")).as("arm1"), d(col("n1") - col("n0")).as("delta")),
        struct(lit("var_reduction").as("metric"), col("vr0").as("arm0"),
          col("vr1").as("arm1"),
          round(col("vr1") - col("vr0"), 6).as("delta")))).as("r"))
      .select(col("r.metric"), col("r.arm0"), col("r.arm1"), col("r.delta"))

    val mwRows = Experiment.mannWhitney(events, userCol)
      .select(lit("mw_z").as("metric"), dnull.as("arm0"), dnull.as("arm1"),
        col("z").as("delta"))

    val srmRows = Experiment.srmCheck(events, userCol, segmentCol)
      .agg(max(col("chi2")).as("c"))
      .select(lit("srm_chi2_max").as("metric"), dnull.as("arm0"),
        dnull.as("arm1"), col("c").as("delta"))

    val qteRows = Experiment.quantileTreatment(events, userCol,
        qs = Seq(0.25, 0.5, 0.75))
      .select(
        concat(lit("p"), (col("q") * 100).cast("int").cast("string"))
          .as("metric"),
        d(col("arm0")).as("arm0"), d(col("arm1")).as("arm1"),
        d(col("diff")).as("delta"))

    meanRows.unionAll(mwRows).unionAll(srmRows).unionAll(qteRows)
  }
}
