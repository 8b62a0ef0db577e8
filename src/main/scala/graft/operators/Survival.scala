package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-to-event (survival) readouts over an event log: the
  * Kaplan-Meier product-limit estimator (Kaplan & Meier 1958) and the
  * log-rank test (Mantel 1966) between the engine's deterministic hash
  * arms — the standard pair for "did the treatment change time to
  * conversion", which mean-based readouts ([[EventAnalytics.cupedAdjust]])
  * and location tests ([[Experiment.mannWhitney]]) both get wrong when
  * observation windows are truncated: users who have not converted YET
  * are right-censored, not zeros.
  *
  * Determinism conventions: durations are integer days, so the risk
  * table is a codomain-bounded frame (distinct duration values, not
  * users) and its cumulative windows are safe; survival multiplies
  * per-step factors in LOG space on the integer microgrid
  * (round(ln(f)*1e6) summed as exact longs — the x181 entropy fold),
  * so both engines add the same integers and only the single outer
  * exp/round is a double; log-rank expectation and variance terms are
  * exact integer-rational roundings computed with HALF-UP integer
  * division on Decimal(38,0) (floor((2*a*SCALE + b) / (2*b))) — no
  * double summation order anywhere before the final rounded columns.
  */
object Survival {

  private val MICRO = 1000000L
  private val dec = DecimalType(38, 0)
  private def d(c: Column): Column = c.cast(DoubleType)

  /** Per-user duration/event frame: one row per user with `t` = whole
    * days from the user's first event to their first `convertType`
    * event (event = 1) or, if they never convert, to their last
    * observed event (right-censored, event = 0). A user whose first
    * event already converts has t = 0, event = 1 — the estimator
    * handles day-0 mass like any other time point. */
  def durations(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convertType: String): DataFrame = {
    val conv = min(when(col(typeCol) === convertType, col(tsCol)))
    events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("start"), conv.as("conv_ts"),
        max(col(tsCol)).as("last_ts"))
      .select(col(userCol).as("uid"),
        when(col("conv_ts").isNotNull,
          datediff(to_date(col("conv_ts")), to_date(col("start"))))
          .otherwise(datediff(to_date(col("last_ts")),
            to_date(col("start")))).cast("long").as("t"),
        when(col("conv_ts").isNotNull, 1L).otherwise(0L).as("e"))
  }

  /** Kaplan-Meier risk table + survival curve. Output one row per
    * distinct duration day: (t_days, n_risk, d, c, survival) where
    * n_risk counts users with T >= t (censored-at-t users are still at
    * risk at t, the standard convention), d = conversions at t, c =
    * censorings at t, and survival = prod over s <= t of
    * (n_s - d_s)/n_s via the microgrid log fold. If a step exhausts
    * the risk set (n = d), survival pins to exactly 0.0 from that row
    * on (the absorbing state ln cannot represent).
    *
    * 100 TB shape: one per-user groupBy (partial-agged) then one
    * groupBy onto the distinct-duration frame; the cumulative windows
    * order a frame bounded by the calendar span in days, never by
    * users. Nothing collects to the driver. */
  /** The shared risk table: one row per distinct duration with
    * (t, d, c, n_risk) — the base frame of [[kaplanMeier]] and
    * [[nelsonAalen]]. */
  private def riskTable(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, convertType: String): DataFrame = {
    val dur = durations(events, userCol, tsCol, typeCol, convertType)
    val byT = dur.groupBy(col("t"))
      .agg(sum(col("e")).as("d"),
        sum(lit(1L) - col("e")).as("c"))
    val tot = Window.partitionBy(lit(1))
    val before = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byT
      .withColumn("n_all", sum(col("d") + col("c")).over(tot))
      .withColumn("n_risk",
        col("n_all") - coalesce(sum(col("d") + col("c")).over(before),
          lit(0L)))
  }

  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convertType: String): DataFrame = {
    val upTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = riskTable(events, userCol, tsCol, typeCol, convertType)
    // ln((n-d)/n) on the integer microgrid; n == d is the absorbing 0
    val lnMicro = when(col("d") === 0L, lit(0L))
      .when(col("n_risk") === col("d"), lit(0L))
      .otherwise(round(log(d(col("n_risk") - col("d")) /
        d(col("n_risk"))) * lit(MICRO.toDouble)).cast("long"))
    risk
      .withColumn("ln_micro", lnMicro)
      .withColumn("dead", max(when(col("n_risk") === col("d"), 1L)
        .otherwise(0L)).over(upTo))
      .withColumn("cum_ln", sum(col("ln_micro")).over(upTo))
      .select(col("t").as("t_days"), col("n_risk"), col("d"), col("c"),
        when(col("dead") === 1L, lit(0.0))
          .otherwise(round(exp(d(col("cum_ln")) / lit(MICRO.toDouble)),
            6)).as("survival"))
      .orderBy(col("t_days"))
  }

  /** Nelson-Aalen cumulative hazard (Nelson 1972, Aalen 1978):
    * H(t) = Σ over s <= t of d_s/n_s on the same risk table as
    * [[kaplanMeier]] — the estimator whose INCREMENTS are the hazard
    * itself (flat stretches = calm periods, jumps = conversion waves),
    * and the better-behaved small-risk-set companion (it never hits an
    * absorbing zero; exp(-H) is the Fleming-Harrington survival
    * variant reported alongside). Each d/n term is rounded HALF-UP on
    * the 1e6 microgrid with exact Decimal integer division
    * ([[microDiv]]) and cum-summed as longs; the per-row exp is the
    * single outer transcendental. Output:
    * (t_days, n_risk, d, c, cum_hazard, survival_fh). */
  def nelsonAalen(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convertType: String): DataFrame = {
    val upTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    riskTable(events, userCol, tsCol, typeCol, convertType)
      .withColumn("hm", microDiv(col("d"), col("n_risk")))
      .withColumn("cum_hm", sum(col("hm")).over(upTo))
      .select(col("t").as("t_days"), col("n_risk"), col("d"), col("c"),
        round(d(col("cum_hm")) / lit(MICRO.toDouble), 6)
          .as("cum_hazard"),
        round(exp(-d(col("cum_hm")) / lit(MICRO.toDouble)), 6)
          .as("survival_fh"))
      .orderBy(col("t_days"))
  }

  /** HALF-UP integer rounding of the rational a/b to the 1e6 microgrid,
    * in Decimal(38,0): floor((2*a*1e6 + b) / (2*b)). Exact in both
    * engines (positive operands; Decimal `div` floors). */
  private def microDiv(a: Column, b: Column): Column =
    call_function("div",
      lit(2L).cast(dec) * a.cast(dec) * lit(MICRO).cast(dec) +
        b.cast(dec),
      lit(2L).cast(dec) * b.cast(dec)).cast("long")

  /** Restricted mean survival time (RMST) to horizon `tauDays`, per
    * deterministic hash arm ([[Experiment.armOf]]), plus the
    * between-arm difference — the EFFECT-SIZE companion to [[logRank]]
    * (Royston & Parmar 2013): log-rank says whether the curves differ,
    * RMST says by how many days of delayed conversion, and unlike the
    * median it is defined even when the curve never crosses 0.5.
    * RMST = area under the KM step curve on [0, tau]: the head
    * interval [0, t_min) at survival 1, then each grid step's
    * survival times its (tau-capped) width.
    *
    * Determinism: per-arm survival uses the exact [[kaplanMeier]]
    * microgrid log fold; the step survival is re-quantized to integer
    * micro-units (round(exp(cum_ln/1e6)*1e6)), so the area fold is a
    * sum of exact survival_micro * width_days longs — only the final
    * /1e6 rounding is a double. Output one row:
    * (tau_days, n0, n1, rmst0, rmst1, rmst_diff).
    *
    * 100 TB shape: the [[kaplanMeier]] shape with windows partitioned
    * by arm — user-partial aggs into an (arm x duration-days) bounded
    * frame; every window orders that frame, never users. */
  def rmstByArm(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convertType: String, tauDays: Long): DataFrame = {
    val dur = durations(events, userCol, tsCol, typeCol, convertType)
      .withColumn("arm", Experiment.armOf(col("uid"), 2))
    val byT = dur.groupBy(col("arm"), col("t"))
      .agg(sum(col("e")).as("d"), sum(lit(1L) - col("e")).as("c"))
    val tot = Window.partitionBy(col("arm"))
    val before = Window.partitionBy(col("arm")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy(col("arm")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lnMicro = when(col("d") === 0L, lit(0L))
      .when(col("n_risk") === col("d"), lit(0L))
      .otherwise(round(log(d(col("n_risk") - col("d")) /
        d(col("n_risk"))) * lit(MICRO.toDouble)).cast("long"))
    val curve = byT
      .withColumn("n_all", sum(col("d") + col("c")).over(tot))
      .withColumn("n_risk", col("n_all") -
        coalesce(sum(col("d") + col("c")).over(before), lit(0L)))
      .withColumn("ln_micro", lnMicro)
      .withColumn("dead", max(when(col("n_risk") === col("d"), 1L)
        .otherwise(0L)).over(upTo))
      .withColumn("cum_ln", sum(col("ln_micro")).over(upTo))
      .withColumn("s_micro", when(col("dead") === 1L, lit(0L))
        .otherwise(round(exp(d(col("cum_ln")) / lit(MICRO.toDouble)) *
          lit(MICRO.toDouble)).cast("long")))
    // head interval [0, min(t, tau)) at survival 1 — survives even
    // when every grid point is at or past tau
    val heads = curve.groupBy(col("arm"))
      .agg((least(min(col("t")), lit(tauDays)) * lit(MICRO))
        .as("head_micro"), max(col("n_all")).as("n_arm"))
    // grid steps strictly before tau; each extends to the next grid
    // point or tau, whichever is first
    val nextT = Window.partitionBy(col("arm")).orderBy(col("t"))
    val steps = curve.filter(col("t") < tauDays)
      .withColumn("next_t",
        least(coalesce(lead(col("t"), 1).over(nextT), lit(tauDays)),
          lit(tauDays)))
      .groupBy(col("arm"))
      .agg(sum(col("s_micro") * (col("next_t") - col("t")))
        .as("steps_micro"))
    val perArm = heads.join(broadcast(steps), Seq("arm"), "left")
      .select(col("arm"), col("n_arm"),
        (col("head_micro") + coalesce(col("steps_micro"), lit(0L)))
          .as("rmst_micro"))
    perArm.groupBy(lit(1).as("one"))
      .agg(
        sum(when(col("arm") === 0L, col("n_arm"))).as("n0"),
        sum(when(col("arm") === 1L, col("n_arm"))).as("n1"),
        sum(when(col("arm") === 0L, col("rmst_micro"))).as("r0m"),
        sum(when(col("arm") === 1L, col("rmst_micro"))).as("r1m"))
      .select(lit(tauDays).as("tau_days"), col("n0"), col("n1"),
        round(d(col("r0m")) / lit(MICRO.toDouble), 6).as("rmst0"),
        round(d(col("r1m")) / lit(MICRO.toDouble), 6).as("rmst1"),
        round((d(col("r1m")) - d(col("r0m"))) / lit(MICRO.toDouble), 6)
          .as("rmst_diff"))
  }

  /** Log-rank test between the two deterministic hash arms
    * ([[Experiment.armOf]]) on time to first `convertType` event.
    * At each distinct pooled duration t: n = at-risk total, n1 =
    * at-risk in arm 1, dAll = pooled conversions, o1 = arm-1
    * conversions; E1_t = dAll*n1/n and the hypergeometric variance
    * V_t = dAll*n1*(n-n1)*(n-dAll) / (n^2*(n-1)) (0 when n <= 1) are
    * rounded HALF-UP to the 1e6 microgrid in exact Decimal integer
    * arithmetic and summed as longs. Output one row:
    * (n_users, o1, e1, v, chi2, significant) with chi2 =
    * (o1-E1)^2/V (NULL at V = 0) against the pinned 5% chi-square(1)
    * critical value 3.841459 — the same convention as
    * [[Experiment.srmCheck]].
    *
    * 100 TB shape: identical to [[kaplanMeier]] — user-partial aggs
    * into a duration-bounded risk frame, then one 1-row reduce. */
  def logRank(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convertType: String): DataFrame = {
    val dur = durations(events, userCol, tsCol, typeCol, convertType)
      .withColumn("arm", Experiment.armOf(col("uid"), 2))
    val byT = dur.groupBy(col("t"))
      .agg(sum(col("e")).as("d_all"),
        sum(when(col("arm") === 1L, col("e")).otherwise(0L)).as("d1"),
        count(lit(1)).as("leave"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("leave1"))
    val tot = Window.partitionBy(lit(1))
    val before = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT
      .withColumn("n_users", sum(col("leave")).over(tot))
      .withColumn("n1_users", sum(col("leave1")).over(tot))
      .withColumn("n", col("n_users") -
        coalesce(sum(col("leave")).over(before), lit(0L)))
      .withColumn("n1", col("n1_users") -
        coalesce(sum(col("leave1")).over(before), lit(0L)))
    val e1Micro = microDiv(col("d_all") * col("n1"), col("n"))
    val vNum = col("d_all").cast(dec) * col("n1").cast(dec) *
      (col("n") - col("n1")).cast(dec) *
      (col("n") - col("d_all")).cast(dec)
    val vDen = col("n").cast(dec) * col("n").cast(dec) *
      (col("n") - lit(1L)).cast(dec)
    val vMicro = when(col("n") <= 1L, lit(0L))
      .otherwise(microDiv(vNum, vDen))
    val folded = risk
      .select(col("n_users"), col("d1"), e1Micro.as("e1m"),
        vMicro.as("vm"))
      .groupBy(col("n_users"))
      .agg(sum(col("d1")).as("o1"), sum(col("e1m")).as("e1m"),
        sum(col("vm")).as("vm"))
    val e1 = d(col("e1m")) / lit(MICRO.toDouble)
    val v = d(col("vm")) / lit(MICRO.toDouble)
    val chi2Raw = when(col("vm") === 0L, lit(null).cast(DoubleType))
      .otherwise((d(col("o1")) - e1) * (d(col("o1")) - e1) / v)
    folded.select(col("n_users"), col("o1"),
      round(e1, 6).as("e1"), round(v, 6).as("v"),
      round(chi2Raw, 6).as("chi2"),
      (chi2Raw > 3.841459).as("significant"))
  }
}
