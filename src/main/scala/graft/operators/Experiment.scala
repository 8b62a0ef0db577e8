package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions

/** Experiment-readout operators over an event log: deterministic hash
  * arms (the engine's reproducible-split convention, same md5 family as
  * [[CorpusOps.hashSplit]]), a sample-ratio-mismatch guardrail, and
  * nonparametric effect readouts (Mann-Whitney U, quantile treatment
  * effects) that complement [[EventAnalytics.cupedAdjust]]'s mean-based
  * readout.
  *
  * All metrics are integer-valued per user (counts), so rank statistics
  * and quantiles are exact and cross-engine reproducible — no double
  * summation order anywhere before the final rounded columns.
  */
object Experiment {

  /** Deterministic arm for a user id: md5-hash mod `arms`. */
  def armOf(userCol: Column, arms: Int): Column =
    pmod(TextFunctions.md5Long(userCol), lit(arms.toLong))

  /** Sample-ratio-mismatch check per segment: a chi-square test that the
    * hash split actually produced the expected uniform arm ratio inside
    * every `segmentCol` value. A skewed ratio means the unit of
    * randomization leaks into the segment (bots, dupes, a biased hash
    * input) and every downstream readout is suspect — the first guardrail
    * any experimentation platform runs.
    *
    * Output per segment: per-arm user counts (arm 0/1), total, chi2
    * (1 dof), and the 5% flag (chi2 > 3.841459 — the 0.95 quantile of
    * chi-square with one degree of freedom). Integer counts into one
    * exact double expression.
    *
    * 100 TB shape: one distinct (segment, user) reduction — partial-agged
    * — then a segment-sized groupBy. Nothing else.
    */
  def srmCheck(events: DataFrame, userCol: String,
      segmentCol: String): DataFrame = {
    val users = events.select(col(segmentCol).as("segment"), col(userCol))
      .distinct()
      .withColumn("arm", armOf(col(userCol), 2))
    val d = (c: Column) => c.cast(DoubleType)
    users.groupBy(col("segment"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_arm0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_arm1"))
      .withColumn("n_total", col("n_arm0") + col("n_arm1"))
      // chi2 for a 50/50 split collapses to (n0-n1)^2 / n
      .withColumn("chi2", round(
        (d(col("n_arm0")) - d(col("n_arm1"))) *
          (d(col("n_arm0")) - d(col("n_arm1"))) / d(col("n_total")), 6))
      .withColumn("mismatch", col("chi2") > 3.841459)
  }

  /** Per-user integer metric (event count), with the hash arm attached —
    * the shared input of the rank-based readouts below. */
  private def perUserCounts(events: DataFrame, userCol: String): DataFrame =
    events.groupBy(col(userCol))
      .agg(count(lit(1)).as("m"))
      .withColumn("arm", armOf(col(userCol), 2))

  /** Mann-Whitney U readout between the two hash arms on the per-user
    * event-count metric: the nonparametric "is one arm stochastically
    * larger" test that survives the heavy-tailed metrics CUPED's
    * mean-based readout struggles with. Midranks with tie correction
    * (Lehmann 1975): U1 = R1 - n1(n1+1)/2 over average ranks, and the
    * normal-approximation z uses the tie-corrected variance
    * n1 n2/12 * ((N+1) - sum(t^3-t)/(N(N-1))).
    *
    * Cross-engine exactness: the metric is an integer count, so the rank
    * frame (value -> count per arm) is exact; midranks and all moments
    * are single double expressions over exact integers.
    *
    * 100 TB shape: one per-user partial-agged groupBy, then EVERYTHING
    * runs on the distinct-metric-value frame (codomain-bounded, the
    * aucExact convention) — the cumulative window is over that reduced
    * frame, never rows. Output: one row (n1, n2, u1, z).
    */
  def mannWhitney(events: DataFrame, userCol: String): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val byValue = perUserCounts(events, userCol)
      .groupBy(col("m"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("t1"))
    // codomain-bounded cumulative frame (distinct metric values)
    val w = Window.orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byValue
      .withColumn("cum", sum(col("t")).over(w))
      .withColumn("avg_rank",
        d(col("cum") - col("t")) + (d(col("t")) + 1.0) / 2.0)
    val agg = ranked.agg(
        sum(col("t") - col("t1")).as("n0"), sum(col("t1")).as("n1"),
        sum(d(col("t1")) * col("avg_rank")).as("r1"),
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    // degenerate inputs (an empty arm, or every metric value tied) have
    // zero rank variance: pin z to NULL rather than 0/0 (the x172/x198
    // convention), same CASE in the oracle
    val variance = d(col("n0")) * d(col("n1")) / 12.0 *
      ((d(col("n0") + col("n1")) + 1.0) -
        d(col("ties")) / (d(col("n0") + col("n1")) *
          (d(col("n0") + col("n1")) - 1.0)))
    agg.select(col("n0"), col("n1"),
        round(col("r1") - d(col("n1")) * (d(col("n1")) + 1.0) / 2.0, 6)
          .as("u1"),
        round(when(variance <= 0.0, lit(null).cast(DoubleType)).otherwise(
          (col("r1") - d(col("n1")) * (d(col("n1")) + 1.0) / 2.0 -
            d(col("n0")) * d(col("n1")) / 2.0) / sqrt(variance)), 6)
          .as("z"))
  }

  /** Covariate balance check: the standardized mean difference
    * SMD = (m1 - m0) / sqrt((v1 + v0) / 2) per pre-experiment covariate
    * across the two hash arms (Austin 2009's balance diagnostic; |SMD| <
    * 0.1 is the conventional "balanced" threshold). SRM ([[srmCheck]])
    * catches the COUNT imbalance; this catches the composition imbalance
    * a correct 50/50 split can still hide — and it is the pre-test that
    * justifies CUPED's covariate in the first place.
    *
    * Covariates are integer per-user aggregates (event count, distinct
    * active days, distinct event types), so all moments are exact
    * integer sums into one double expression per row.
    *
    * 100 TB shape: one per-user partial-agged groupBy, one 1-row
    * conditional-moment aggregate, a 3-row fan-out. Nothing else.
    */
  def covariateBalance(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, threshold: Double = 0.1): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val perUser = events.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(to_date(col(tsCol))).as("n_days"),
        count_distinct(col(typeCol)).as("n_types"))
      .withColumn("arm", armOf(col(userCol), 2))
    val covs = Seq("n_events", "n_days", "n_types")
    val sums = covs.flatMap { c =>
      Seq(sum(when(col("arm") === 0, col(c)).otherwise(0L)).as(s"s0_$c"),
        sum(when(col("arm") === 0, col(c) * col(c)).otherwise(0L))
          .as(s"q0_$c"),
        sum(when(col("arm") === 1, col(c)).otherwise(0L)).as(s"s1_$c"),
        sum(when(col("arm") === 1, col(c) * col(c)).otherwise(0L))
          .as(s"q1_$c"))
    } ++ Seq(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
    val agg = perUser.agg(sums.head, sums.tail: _*)
    val rows = covs.map { c =>
      val m0 = d(col(s"s0_$c")) / d(col("n0"))
      val m1 = d(col(s"s1_$c")) / d(col("n1"))
      val v0 = d(col(s"q0_$c")) / d(col("n0")) - m0 * m0
      val v1 = d(col(s"q1_$c")) / d(col("n1")) - m1 * m1
      struct(lit(c).as("covariate"),
        round(m0, 6).as("mean_arm0"), round(m1, 6).as("mean_arm1"),
        round(when((v0 + v1) <= 0.0, lit(null).cast(DoubleType))
          .otherwise((m1 - m0) / sqrt((v0 + v1) / 2.0)), 6).as("smd"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.covariate").as("covariate"),
        col("r.mean_arm0").as("mean_arm0"),
        col("r.mean_arm1").as("mean_arm1"), col("r.smd").as("smd"))
      .withColumn("balanced", col("smd").isNotNull &&
        abs(col("smd")) < threshold)
  }

  /** Qini uplift curve over score deciles (Radcliffe 2007): rank users by
    * a targeting score (here the PRE-cutoff covariate, an integer event
    * count), cut into `bins` equal-count buckets on the bounded
    * distinct-score frame, and per cumulative bucket report the uplift
    * estimate qini = Y_t - Y_c * N_t / N_c (incremental conversions vs
    * the control scaled to the treated population). The decision curve
    * behind "target the top-k% by model score" — a targeting model is
    * only worth shipping if its qini dominates the random-targeting
    * diagonal.
    *
    * Outcome = POST-cutoff event count per user (integer), arms by
    * deterministic hash — every moment is exact integer arithmetic into
    * the final rounded column.
    *
    * 100 TB shape: one per-user partial agg; deciles come from the
    * distinct-score cumulative frame (codomain-bounded, the x203
    * convention), never a row sort; the curve is a bins-sized rollup.
    */
  def qiniCurve(events: DataFrame, userCol: String, tsCol: String,
      cutoff: String, bins: Int = 10): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(sum(when(col(tsCol) < lit(cutoff).cast("timestamp"), 1L)
          .otherwise(0L)).as("score"),
        sum(when(col(tsCol) >= lit(cutoff).cast("timestamp"), 1L)
          .otherwise(0L)).as("y"))
      .withColumn("arm", armOf(col(userCol), 2))
    qiniScored(perUser, "score", "y", "arm", bins)
  }

  /** Qini rollup over an ALREADY-SCORED per-unit frame — the composition
    * point where the experiment suite meets the model-scoring surface:
    * `scoreCol` can be any targeting score (x209 feeds the integer
    * pre-cutoff covariate; x214 feeds the x50 BOW classifier's rounded
    * probability). Bins are equal-count by score DESC on the distinct-
    * score frame (codomain-bounded: integer covariates by domain,
    * model probabilities by the 6-digit round — at most 1e6+1 values);
    * ties stay in one bin. The cumulative position runs through
    * [[Scale.cumByRange]]'s partitioned two-pass shape, so even a
    * near-unique score column never funnels one task. */
  def qiniScored(perUser: DataFrame, scoreCol: String, outcomeCol: String,
      armCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val d = (c: Column) => c.cast(DoubleType)
    val byScore = perUser.groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("t"))
      // cumByRange orders ASC; rank best-target-first via the negation
      .withColumn("__negs", negate(col("score")))
    val binned = Scale.cumByRange(byScore, "__negs", "t")
      // the score's FIRST user decides its bin (ties stay together)
      .withColumn("bin", call_function("div",
        (col("cum") - col("t")) * bins.toLong, col("n")))
      .select(col("score"), col("bin"))
    val cw = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perUser.withColumnRenamed(scoreCol, "__graft_sc__")
      .join(binned, col("__graft_sc__") === col("score"))
      .groupBy(col("bin"))
      .agg(sum(when(col(armCol) === 1, 1L).otherwise(0L)).as("bt"),
        sum(when(col(armCol) === 0, 1L).otherwise(0L)).as("bc"),
        sum(when(col(armCol) === 1, col(outcomeCol)).otherwise(0L)).as("byt"),
        sum(when(col(armCol) === 0, col(outcomeCol)).otherwise(0L)).as("byc"))
      .withColumn("n_treated", sum(col("bt")).over(cw))
      .withColumn("n_control", sum(col("bc")).over(cw))
      .withColumn("y_treated", sum(col("byt")).over(cw))
      .withColumn("y_control", sum(col("byc")).over(cw))
      .select(col("bin"), col("n_treated"), col("n_control"),
        col("y_treated"), col("y_control"),
        // a cumulative prefix with no control users yet has no estimate
        round(when(col("n_control") === 0, lit(null).cast(DoubleType))
          .otherwise(d(col("y_treated")) - d(col("y_control")) *
            d(col("n_treated")) / d(col("n_control"))), 6).as("qini"))
  }

  /** Always-valid sequential test (mSPRT, Johari-Koomen-Pekelis-Walsh
    * 2017) on the daily arm-total difference: after each day t the
    * mixture likelihood ratio over the running mean difference is
    * Lambda_t = sqrt(V/(V+tau)) * exp(S^2 tau / (2 V (V+tau))) with
    * S = sum of daily differences and V = t * sigma2_hat (population
    * variance of the daily differences, exact integer moments); the
    * always-valid p-value is min(1, 1/Lambda) and is monotonically
    * tightening — the experimenter can PEEK every day without inflating
    * false positives, which is how dashboards actually get used.
    *
    * 100 TB shape: events reduce to one row per (day, arm) by partial
    * aggregation; everything after runs on the days-sized frame
    * (calendar-bounded windows, the x169 convention). Integer daily
    * counts make every moment exact; exp/sqrt land in the round-6
    * convention.
    */
  def msprt(events: DataFrame, userCol: String, tsCol: String,
      tau: Double = 1.0, alpha: Double = 0.05): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val daily = events
      .select(to_date(col(tsCol)).as("day"),
        armOf(col(userCol), 2).as("arm"))
      .groupBy(col("day"))
      .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("c0"))
      .withColumn("diff", col("c1") - col("c0"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("s1", sum(col("diff")).over(w))
      .withColumn("s2", sum(col("diff") * col("diff")).over(w))
    cum
      // population variance of the daily diffs from exact integer moments
      .withColumn("v",
        d(col("t")) * ((d(col("s2")) - d(col("s1")) * d(col("s1")) /
          d(col("t"))) / d(col("t"))))
      .withColumn("lambda",
        when(col("v") <= 0.0, lit(null).cast(DoubleType)).otherwise(
          sqrt(col("v") / (col("v") + tau)) *
            exp(d(col("s1")) * d(col("s1")) * tau /
              (lit(2.0) * col("v") * (col("v") + tau)))))
      .select(col("day"), col("t").as("n_days"), col("c1"), col("c0"),
        round(d(col("s1")) / d(col("t")), 6).as("mean_diff"),
        round(col("lambda"), 6).as("lambda"),
        round(when(col("lambda").isNull, lit(null).cast(DoubleType))
          .otherwise(least(lit(1.0), lit(1.0) / col("lambda"))), 6)
          .as("p_always_valid"))
      .withColumn("rejected",
        col("p_always_valid").isNotNull && col("p_always_valid") < alpha)
  }

  /** Quantile treatment effects: the per-arm EXACT quantiles of the
    * per-user event-count metric at the requested probabilities, and
    * their difference — "the median user gained X events, the p90 user
    * gained Y" — the distributional readout a mean hides.
    *
    * Exact quantile = value at rank ceil(q*n) (type-1, the inverse ECDF),
    * selected on the per-arm distinct-value cumulative frame — never a
    * row sort. Integer metric, so both engines pick identical values.
    */
  def quantileTreatment(events: DataFrame, userCol: String,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0,1]: $qs")
    val byValue = perUserCounts(events, userCol)
      .groupBy(col("arm"), col("m"))
      .agg(count(lit(1)).as("t"))
    val w = Window.partitionBy(col("arm")).orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nw = Window.partitionBy(col("arm"))
    val cum = byValue
      .withColumn("cum", sum(col("t")).over(w))
      .withColumn("n", sum(col("t")).over(nw))
    // rank ceil(q*n) in exact integer arithmetic: the smallest value whose
    // cumulative count reaches it — min(m) where cum*1e6 >= round(q*1e6)*n
    // (q pinned as an integer numerator). ALL quantiles come out of ONE
    // conditional aggregate over the bounded cum frame — one events scan.
    val nums = qs.map(q => math.round(q * 1000000L))
    val qAggs = nums.map { num =>
      min(when(col("cum") * 1000000L >= lit(num) * col("n"), col("m")))
        .as(s"q_$num")
    }
    val perArm = cum.groupBy(col("arm")).agg(qAggs.head, qAggs.tail: _*)
    val a0 = perArm.filter(col("arm") === 0).drop("arm")
    val a1 = perArm.filter(col("arm") === 1)
      .select(nums.map(n => col(s"q_$n").as(s"q1_$n")): _*)
    val rows = qs.zip(nums).map { case (q, n) =>
      struct(lit(q).as("q"), col(s"q_$n").as("arm0"),
        col(s"q1_$n").as("arm1"))
    }
    a0.crossJoin(broadcast(a1)) // 1-row x 1-row
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.q").as("q"), col("r.arm0").as("arm0"),
        col("r.arm1").as("arm1"),
        (col("r.arm1") - col("r.arm0")).as("diff"))
  }

  /** Difference-in-differences readout (Card-Krueger form on the hash
    * arms): per user, the event count BEFORE and AFTER `cutoff`; per
    * arm, the pre/post means; the DiD estimate is the treated arm's
    * pre-to-post change minus the control arm's — the readout that
    * nets out a shared time trend the raw post-period difference would
    * absorb. The pre-period per-arm means double as the parallel-trends
    * eyeball (arms are hash-random here, so pre means should match; a
    * gap is an SRM-class warning).
    *
    * All moments are exact integers; means divide exact integers into
    * doubles (cross-engine identical), rounded 6 at the edge. One
    * per-user partial agg + a 2-row arm rollup + a 1-row combine —
    * nothing scales past the scan.
    */
  def diffInDiff(events: DataFrame, userCol: String, tsCol: String,
      cutoff: String): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val cut = lit(cutoff).cast("timestamp")
    val perUser = events.groupBy(col(userCol))
      .agg(sum(when(col(tsCol) < cut, 1L).otherwise(0L)).as("c_pre"),
        sum(when(col(tsCol) >= cut, 1L).otherwise(0L)).as("c_post"))
      .withColumn("arm", armOf(col(userCol), 2))
    val perArm = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("c_pre")).as("sp"),
        sum(col("c_post")).as("sq"))
      .select(col("arm"), col("n"),
        (d(col("sp")) / d(col("n"))).as("m_pre"),
        (d(col("sq")) / d(col("n"))).as("m_post"))
    val a0 = perArm.filter(col("arm") === 0)
      .select(col("n").as("n0"), col("m_pre").as("m_pre0"),
        col("m_post").as("m_post0"))
    val a1 = perArm.filter(col("arm") === 1)
      .select(col("n").as("n1"), col("m_pre").as("m_pre1"),
        col("m_post").as("m_post1"))
    a0.crossJoin(broadcast(a1)) // 1-row x 1-row
      .select(col("n0"), col("n1"),
        round(col("m_pre0"), 6).as("mean_pre_control"),
        round(col("m_post0"), 6).as("mean_post_control"),
        round(col("m_pre1"), 6).as("mean_pre_treated"),
        round(col("m_post1"), 6).as("mean_post_treated"),
        round((col("m_post1") - col("m_pre1"))
          - (col("m_post0") - col("m_pre0")), 6).as("did"))
  }

  /** Power / minimum-detectable-effect calculator from the OBSERVED
    * per-arm variance of the per-user count metric — the pre-readout
    * sanity check every platform runs ("at this traffic, what lift
    * could this experiment even see?"). Two-sided alpha, normal
    * approximation: MDE_abs = (z_{1-alpha/2} + z_{power}) *
    * sqrt(s0²/n0 + s1²/n1), relative form vs the control mean. The z
    * constants are pinned 6-digit literals on both engines (1.959964,
    * 0.841621 for the 0.05/0.80 defaults), so the whole readout is
    * exact integer moments into one double expression.
    *
    * One per-user partial agg + a 2-row arm rollup; nothing scales
    * past the scan.
    */
  def powerMde(events: DataFrame, userCol: String,
      zAlpha: Double = 1.959964, zPower: Double = 0.841621): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val perArm = perUserCounts(events, userCol)
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s1"),
        sum(col("m") * col("m")).as("s2"))
      // population variance from exact integer moments
      .select(col("arm"), col("n"),
        (d(col("s1")) / d(col("n"))).as("mean"),
        (d(col("s2")) / d(col("n"))
          - (d(col("s1")) / d(col("n"))) * (d(col("s1")) / d(col("n"))))
          .as("v"))
    val a0 = perArm.filter(col("arm") === 0)
      .select(col("n").as("n0"), col("mean").as("mean0"), col("v").as("v0"))
    val a1 = perArm.filter(col("arm") === 1)
      .select(col("n").as("n1"), col("v").as("v1"))
    a0.crossJoin(broadcast(a1)) // 1-row x 1-row
      .select(col("n0"), col("n1"),
        round(col("mean0"), 6).as("mean_control"),
        round(col("v0"), 6).as("var_control"),
        round(col("v1"), 6).as("var_treated"),
        round(lit(zAlpha + zPower) *
          sqrt(col("v0") / d(col("n0")) + col("v1") / d(col("n1"))), 6)
          .as("mde_abs"),
        round(when(col("mean0") === 0.0, lit(null).cast(DoubleType))
          .otherwise(lit(zAlpha + zPower) *
            sqrt(col("v0") / d(col("n0")) + col("v1") / d(col("n1"))) /
            col("mean0")), 6).as("mde_rel"))
  }

  /** Post-stratified average treatment effect: bucket users by a
    * PRE-cutoff covariate (their pre-period event count, capped at
    * `maxStratum` so the strata domain is bounded), estimate the
    * per-stratum arm means of the POST-cutoff outcome, and combine as
    * ATE = Σ_s w_s (m1_s − m0_s) with w_s = n_s / n — the design-based
    * variance reduction that needs no model at all (the nonparametric
    * sibling of CUPED's regression adjustment; Holt-Smith 1979). Also
    * reports the unadjusted difference for contrast. Strata with only
    * one arm present contribute no effect estimate and are excluded
    * from the weighted sum on both engines (their weight renormalizes
    * away).
    *
    * Exactness: every moment is an integer sum; the weighted
    * combination multiplies exact integer ratios in doubles in a pinned
    * stratum order (sum of per-stratum terms over the bounded strata
    * frame, ordered ascending — both engines fold <= maxStratum+1
    * terms identically via the same rounded-then-DECIMAL convention
    * the bloom advisor uses for its fpp mass).
    */
  def postStratifiedAte(events: DataFrame, userCol: String, tsCol: String,
      cutoff: String, maxStratum: Int = 5): DataFrame = {
    require(maxStratum >= 1, "need at least 2 strata (0..max)")
    val d = (c: Column) => c.cast(DoubleType)
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val cut = lit(cutoff).cast("timestamp")
    val perUser = events.groupBy(col(userCol))
      .agg(sum(when(col(tsCol) < cut, 1L).otherwise(0L)).as("c_pre"),
        sum(when(col(tsCol) >= cut, 1L).otherwise(0L)).as("y"))
      .withColumn("arm", armOf(col(userCol), 2))
      .withColumn("stratum", least(col("c_pre"), lit(maxStratum.toLong)))
    val perStratum = perUser.groupBy(col("stratum"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("y0"),
        sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("y1"))
    // per-stratum effect term, rounded then exact-decimal so the
    // strata-frame sum has no double summation order
    val both = col("n0") > 0L && col("n1") > 0L
    val term = round((d(col("n0")) + d(col("n1"))) *
      (d(col("y1")) / d(col("n1")) - d(col("y0")) / d(col("n0"))), 6)
    val agg = perStratum.agg(
      sum(when(both, col("n0") + col("n1")).otherwise(0L)).as("n_eff"),
      sum(when(both, term).otherwise(lit(0.0))
        .cast(dec)).as("eff_sum"),
      sum(col("n0")).as("tn0"), sum(col("n1")).as("tn1"),
      sum(col("y0")).as("ty0"), sum(col("y1")).as("ty1"),
      sum(when(both, 1L).otherwise(0L)).as("n_strata"))
    agg.select(col("tn0").as("n0"), col("tn1").as("n1"),
      col("n_strata"),
      round(d(col("ty1")) / d(col("tn1"))
        - d(col("ty0")) / d(col("tn0")), 6).as("ate_unadjusted"),
      round(col("eff_sum").cast("string").cast("double") /
        d(col("n_eff")), 6).as("ate_post_stratified"))
  }

  /** Doubly-robust AIPW treatment effect (Robins-Rotnitzky-Zhao 1994):
    * augment the inverse-propensity estimator with per-arm LINEAR
    * outcome models m_t(x) = α_t + β_t·x regressing the post-cutoff
    * outcome on the pre-cutoff activity covariate —
    * ψ = (1/n) Σ_i [ m1(x_i) − m0(x_i)
    *               + T_i (y_i − m1(x_i)) / e
    *               − (1−T_i)(y_i − m0(x_i)) / (1−e) ]
    * with the KNOWN randomization propensity e = 1/2 (the hash split),
    * so the estimator is consistent even when the linear models are
    * wrong, and strictly more efficient than the raw difference when
    * they help. Completes the adjustment trio: CUPED (one pooled
    * regression), post-stratification (design-based), AIPW (model +
    * design combined).
    *
    * With linear m_t every Σ collapses algebraically onto the per-arm
    * moment frame — Σ_i m_t(x_i) = n·α_t + β_t·Σx, Σ_{i∈T_t}(y_i −
    * m_t(x_i)) = sy_t − α_t·n_t − β_t·sx_t — so the whole readout is
    * ONE per-user partial agg + a 2-row arm rollup of exact integer
    * moments folded in a single double expression (the [[powerMde]]
    * shape); nothing scales past the scan. A zero-variance covariate
    * inside an arm pins β_t = 0 (the CUPED theta convention), making
    * m_t the arm mean and AIPW collapse to the unadjusted difference.
    *
    * Output one row: (n0, n1, beta0, beta1, ate_unadjusted, ate_reg —
    * the pure regression-imputation estimate — and ate_aipw). */
  def aipwAte(events: DataFrame, userCol: String, tsCol: String,
      cutoff: String): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val cut = lit(cutoff).cast("timestamp")
    val perUser = events.groupBy(col(userCol))
      .agg(sum(when(col(tsCol) < cut, 1L).otherwise(0L)).as("x"),
        sum(when(col(tsCol) >= cut, 1L).otherwise(0L)).as("y"))
      .withColumn("arm", armOf(col(userCol), 2))
    val perArm = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
    def armFrame(t: Int): DataFrame = {
      val den = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
      val beta = when(den === 0.0, lit(0.0)).otherwise(
        (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / den)
      perArm.filter(col("arm") === t.toLong)
        .select(col("n").as(s"n$t"), col("sx").as(s"sx$t"),
          col("sy").as(s"sy$t"), beta.as(s"beta$t"))
        .withColumn(s"alpha$t",
          (d(col(s"sy$t")) - col(s"beta$t") * d(col(s"sx$t"))) /
            d(col(s"n$t")))
    }
    armFrame(0).crossJoin(broadcast(armFrame(1))) // 1-row x 1-row
      .withColumn("nn", d(col("n0")) + d(col("n1")))
      .withColumn("sxall", d(col("sx0")) + d(col("sx1")))
      // regression imputation: mean of m1(x)-m0(x) over ALL users
      .withColumn("reg", col("alpha1") - col("alpha0") +
        (col("beta1") - col("beta0")) * col("sxall") / col("nn"))
      // augmentation: arm-t residual mass, scaled by 1/e = 2
      .withColumn("aug1", lit(2.0) * (d(col("sy1")) -
        col("alpha1") * d(col("n1")) - col("beta1") * d(col("sx1"))) /
        col("nn"))
      .withColumn("aug0", lit(2.0) * (d(col("sy0")) -
        col("alpha0") * d(col("n0")) - col("beta0") * d(col("sx0"))) /
        col("nn"))
      .select(col("n0"), col("n1"),
        round(col("beta0"), 6).as("beta0"),
        round(col("beta1"), 6).as("beta1"),
        round(d(col("sy1")) / d(col("n1")) -
          d(col("sy0")) / d(col("n0")), 6).as("ate_unadjusted"),
        round(col("reg"), 6).as("ate_reg"),
        round(col("reg") + col("aug1") - col("aug0"), 6).as("ate_aipw"))
  }

  /** Cluster-randomized treatment effect with CLUSTER-LEVEL inference
    * (Donner & Klar 2000): when randomization happens at the cluster
    * grain (a source, a region, a crawl host — anything where spillover
    * breaks user-level independence), the correct unit of analysis is
    * the cluster mean: ATE = mean-of-cluster-means difference, variance
    * from the BETWEEN-cluster sample variance s²_t/k_t + s²_c/k_c, and
    * the t statistic carries k−2 degrees of freedom, not n−2 — reading
    * user-level variance here understates the SE by the design effect
    * and "discovers" effects that are one noisy cluster.
    *
    * Cross-engine exactness: cluster means round to the 1e-6 grid and
    * their per-arm sums fold as exact DECIMAL (the x219 convention —
    * no double summation order anywhere); the variance/SE is one double
    * expression over the string-cast decimal sums. An arm with fewer
    * than 2 clusters pins se/t NULL.
    *
    * 100 TB shape: one partial-agged groupBy(cluster), then everything
    * runs on the cluster-domain frame. Output one row:
    * (k0, k1, mean0, mean1, ate, se, t). */
  def clusterAte(df: DataFrame, clusterCol: String,
      valueCol: String): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val perCluster = df.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"))
      .withColumn("arm", armOf(col(clusterCol), 2))
      .withColumn("m", round(d(col("s")) / d(col("n")), 6))
      .withColumn("m2", round(col("m") * col("m"), 6))
    val perArm = perCluster.groupBy(col("arm"))
      .agg(count(lit(1)).as("k"),
        sum(col("m").cast(dec)).as("s1"),
        sum(col("m2").cast(dec)).as("s2"))
      .select(col("arm"), col("k"),
        col("s1").cast("string").cast(DoubleType).as("s1"),
        col("s2").cast("string").cast(DoubleType).as("s2"))
    def armF(t: Int): DataFrame = {
      val mean = col("s1") / d(col("k"))
      val v = when(col("k") < 2L, lit(null).cast(DoubleType))
        .otherwise((col("s2") - col("s1") * col("s1") / d(col("k"))) /
          (d(col("k")) - lit(1.0)))
      perArm.filter(col("arm") === t.toLong)
        .select(col("k").as(s"k$t"), mean.as(s"mean$t"), v.as(s"v$t"))
    }
    armF(0).crossJoin(broadcast(armF(1))) // 1-row x 1-row
      .withColumn("se_raw",
        sqrt(col("v1") / d(col("k1")) + col("v0") / d(col("k0"))))
      .select(col("k0"), col("k1"),
        round(col("mean0"), 6).as("mean0"),
        round(col("mean1"), 6).as("mean1"),
        round(col("mean1") - col("mean0"), 6).as("ate"),
        round(col("se_raw"), 6).as("se"),
        round(when(col("se_raw") === 0.0, lit(null).cast(DoubleType))
          .otherwise((col("mean1") - col("mean0")) / col("se_raw")), 6)
          .as("t_stat"))
  }

  /** Exact two-sample Kolmogorov-Smirnov distance between the arms on
    * the per-user count metric: D = max over metric values of
    * |F1(v) − F0(v)|, computed on the codomain-bounded distinct-value
    * cumulative frame — EXACT integer cross-multiplication (|c1·n0 −
    * c0·n1| over n0·n1), so both engines agree to the bit before the
    * final rounded columns. Reports D, the scaled statistic
    * sqrt(n0·n1/(n0+n1))·D, and the Kolmogorov asymptotic significance
    * flag at the pinned 5% critical value 1.358 (Smirnov 1948) — the
    * whole-distribution companion to Mann-Whitney's location test.
    */
  def ksArms(events: DataFrame, userCol: String): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val byValue = perUserCounts(events, userCol)
      .groupBy(col("m"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("t0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("t1"))
    val w = Window.orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(lit(1))
    // codomain-bounded cumulative (distinct metric values, not users)
    val cum = byValue
      .withColumn("c0", sum(col("t0")).over(w))
      .withColumn("c1", sum(col("t1")).over(w))
      .withColumn("n0", sum(col("t0")).over(tot))
      .withColumn("n1", sum(col("t1")).over(tot))
    cum.agg(max(col("n0")).as("n0"), max(col("n1")).as("n1"),
        max(abs(col("c1") * col("n0") - col("c0") * col("n1"))).as("dn"))
      .select(col("n0"), col("n1"),
        round(d(col("dn")) / (d(col("n0")) * d(col("n1"))), 6).as("ks_d"),
        round(sqrt(d(col("n0")) * d(col("n1")) /
            (d(col("n0")) + d(col("n1")))) *
          (d(col("dn")) / (d(col("n0")) * d(col("n1")))), 6).as("ks_stat"))
      .withColumn("rejected_5pct", col("ks_stat") > 1.358)
  }

  /** Winsorized average treatment effect: clamp the per-user count
    * metric at the POOLED type-1 p / (1-p) quantiles (exact, from the
    * codomain-bounded distinct-value frame — the [[quantileTreatment]]
    * rank convention), then difference the per-arm means of the clamped
    * metric. The robust mean readout for heavy-tailed count metrics: a
    * single bot-user no longer owns the ATE, at a bias the fixed
    * clamp quantiles make explicit. Clamped values are integers, so
    * every moment is exact until the final division.
    *
    * One per-user partial agg; quantiles from one conditional aggregate
    * over the bounded cumulative frame; a 2-row arm rollup.
    */
  def winsorizedAte(events: DataFrame, userCol: String,
      p: Double = 0.05): DataFrame = {
    require(p > 0 && p < 0.5, s"p must be in (0, 0.5): $p")
    val d = (c: Column) => c.cast(DoubleType)
    val perUser = perUserCounts(events, userCol)
    val byValue = perUser.groupBy(col("m")).agg(count(lit(1)).as("t"))
    val w = Window.orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(lit(1))
    // codomain-bounded cumulative (distinct metric values, not users)
    val cum = byValue
      .withColumn("cum", sum(col("t")).over(w))
      .withColumn("n", sum(col("t")).over(tot))
    val loNum = math.round(p * 1000000L)
    val hiNum = math.round((1.0 - p) * 1000000L)
    val bounds = cum.agg(
      min(when(col("cum") * 1000000L >= lit(loNum) * col("n"), col("m")))
        .as("lo"),
      min(when(col("cum") * 1000000L >= lit(hiNum) * col("n"), col("m")))
        .as("hi"))
    perUser.crossJoin(broadcast(bounds)) // per-user x 1-row
      .withColumn("wm", least(greatest(col("m"), col("lo")), col("hi")))
      .groupBy(col("lo"), col("hi"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0, col("wm")).otherwise(0L)).as("s0"),
        sum(when(col("arm") === 1, col("wm")).otherwise(0L)).as("s1"))
      .select(col("lo"), col("hi"), col("n0"), col("n1"),
        round(d(col("s0")) / d(col("n0")), 6).as("wmean_control"),
        round(d(col("s1")) / d(col("n1")), 6).as("wmean_treated"),
        round(d(col("s1")) / d(col("n1")) - d(col("s0")) / d(col("n0")), 6)
          .as("ate_winsorized"))
  }

  /** Exact randomization-inference p-value for the mean difference
    * (Fisher 1935 permutation test, Monte-Carlo form): re-randomize the
    * arm assignment B times with DETERMINISTIC seeded md5 hashes (the
    * x191 bootstrap discipline — reproducible and oracle-replayable),
    * recompute the mean difference under each, and report
    * p = (1 + #{|stat_b| >= |stat_obs|}) / (B + 1) — the add-one form
    * that is a valid p-value at any B. The model-free companion to
    * [[mannWhitney]]'s rank test and [[powerMde]]'s normal
    * approximation: no variance formula, no distributional assumption,
    * just the randomization itself.
    *
    * Exactness: every replicate's sums and counts are exact longs from
    * ONE aggregate pass (2B+4 agg expressions — no explode, no row
    * replication); each statistic is one double expression ROUNDED to
    * the 1e-6 grid before the comparison, so the extreme-count is
    * bit-identical cross-engine. A replicate that lands an empty arm
    * (probability ~2^-n) pins its statistic to NULL and counts as
    * non-extreme on both engines.
    *
    * 100 TB shape: one per-user partial-agged groupBy, then one 1-row
    * aggregate; everything after runs on that row. */
  def permutationTest(events: DataFrame, userCol: String, b: Int = 64,
      seed: Int = 11): DataFrame = {
    require(b >= 19 && b <= 512, s"b must be in [19,512]: $b")
    val d = (c: Column) => c.cast(DoubleType)
    val pu = perUserCounts(events, userCol)
    def armRep(r: Int): Column = pmod(TextFunctions.md5Long(
      concat_ws("|", lit(seed.toString), lit(r.toString),
        col(userCol).cast("string"))), lit(2L))
    val aggs = Seq(
      count(lit(1)).as("nt"), sum(col("m")).as("st"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_obs"),
      sum(when(col("arm") === 1L, col("m")).otherwise(0L)).as("s_obs")) ++
      (0 until b).flatMap { r =>
        val a = armRep(r)
        Seq(sum(when(a === 1L, 1L).otherwise(0L)).as(s"n$r"),
          sum(when(a === 1L, col("m")).otherwise(0L)).as(s"s$r"))
      }
    def stat(s: Column, n: Column): Column =
      when(n === 0L || n === col("nt"), lit(null).cast(DoubleType))
        .otherwise(round(d(s) / d(n) -
          d(col("st") - s) / d(col("nt") - n), 6))
    val row = pu.agg(aggs.head, aggs.tail: _*)
      .withColumn("stat_obs", stat(col("s_obs"), col("n_obs")))
    val extremes = (0 until b).map { r =>
      coalesce(abs(stat(col(s"s$r"), col(s"n$r"))) >= abs(col("stat_obs")),
        lit(false)).cast("long")
    }.reduce(_ + _)
    row.select((col("nt") - col("n_obs")).as("n0"), col("n_obs").as("n1"),
      col("stat_obs"), lit(b.toLong).as("n_replicates"),
      extremes.as("n_extreme"))
      .withColumn("p_value",
        round(d(col("n_extreme") + lit(1L)) / lit(b + 1.0), 6))
  }

  /** Benjamini-Hochberg FDR control across a FAMILY of metrics
    * (Benjamini & Hochberg 1995): one experiment readout per event
    * type — per-user count of that type, mean difference between the
    * hash arms — each tested by the [[permutationTest]] randomization
    * machinery (B seeded re-randomizations, p = (1+extreme)/(B+1),
    * integer-exact), then the K p-values ranked ascending and rejected
    * up to the largest rank i with p_(i) ≤ i·q/K. The multiple-metrics
    * guardrail every real readout needs: peek at 6 metrics at α=0.05
    * each and the family-wise false-positive rate is ~26%; BH caps the
    * expected FALSE-DISCOVERY fraction at q instead.
    *
    * Exactness: p-values are exact rationals with denominator B+1
    * (no CDF approximation anywhere — the permutation machinery is the
    * whole point); thresholds i·q/K are single double products; both
    * sides compare on the round-6 grid. Step-up ties resolve by the
    * pinned (p asc, metric asc) rank order on both engines.
    *
    * 100 TB shape: one (user,type) partial-agged groupBy, one
    * type-keyed rollup carrying 2B+2 sums, one broadcast 1-row
    * user-frame combine, then BH on the K-row metric frame (the
    * bounded-window convention — K = |event type domain|).
    * Output per metric: (event_type, stat_obs, n_extreme, p_value,
    * bh_rank, bh_threshold, rejected). */
  def fdrBh(events: DataFrame, userCol: String, typeCol: String,
      b: Int = 64, seed: Int = 11, q: Double = 0.1): DataFrame = {
    require(b >= 19 && b <= 512, s"b must be in [19,512]: $b")
    require(q > 0.0 && q < 1.0, s"q must be in (0,1): $q")
    val d = (c: Column) => c.cast(DoubleType)
    def armRep(r: Int): Column = pmod(TextFunctions.md5Long(
      concat_ws("|", lit(seed.toString), lit(r.toString),
        col(userCol).cast("string"))), lit(2L))
    // denominators: arm sizes per replicate over ALL users (a user with
    // zero events of a type still belongs to that metric's denominator)
    val userAggs = Seq(count(lit(1)).as("nt"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_obs")) ++
      (0 until b).map(r =>
        sum(when(armRep(r) === 1L, 1L).otherwise(0L)).as(s"n$r"))
    val userRow = events.select(col(userCol)).distinct()
      .withColumn("arm", armOf(col(userCol), 2))
      .agg(userAggs.head, userAggs.tail: _*)
    // numerators: per-type event mass inside each (re-)randomized arm
    val ut = events.groupBy(col(userCol), col(typeCol))
      .agg(count(lit(1)).as("m"))
    val typeAggs = Seq(sum(col("m")).as("st"),
      sum(when(armOf(col(userCol), 2) === 1L, col("m")).otherwise(0L))
        .as("s_obs")) ++
      (0 until b).map(r =>
        sum(when(armRep(r) === 1L, col("m")).otherwise(0L)).as(s"s$r"))
    val perType = ut.groupBy(col(typeCol))
      .agg(typeAggs.head, typeAggs.tail: _*)
    def stat(s: Column, n: Column): Column =
      when(n === 0L || n === col("nt"), lit(null).cast(DoubleType))
        .otherwise(round(d(s) / d(n) -
          d(col("st") - s) / d(col("nt") - n), 6))
    val extremes = (0 until b).map { r =>
      coalesce(abs(stat(col(s"s$r"), col(s"n$r"))) >= abs(col("stat_obs")),
        lit(false)).cast("long")
    }.reduce(_ + _)
    val tested = perType.crossJoin(broadcast(userRow))
      .withColumn("stat_obs", stat(col("s_obs"), col("n_obs")))
      .withColumn("n_extreme", extremes)
      .withColumn("p_value",
        round(d(col("n_extreme") + lit(1L)) / lit(b + 1.0), 6))
      .select(col(typeCol).as("event_type"), col("stat_obs"),
        col("n_extreme"), col("p_value"))
    // BH step-up on the K-row metric frame (bounded window)
    val tot = Window.partitionBy(lit(1))
    val ranked = tested
      .withColumn("bh_rank", row_number().over(Window.partitionBy(lit(1))
        .orderBy(col("p_value").asc_nulls_last, col("event_type").asc)))
      .withColumn("k_metrics", count(lit(1)).over(tot))
      .withColumn("bh_threshold",
        round(d(col("bh_rank")) * lit(q) / d(col("k_metrics")), 6))
    ranked
      .withColumn("k_max", max(when(col("p_value") <= col("bh_threshold"),
        col("bh_rank")).otherwise(lit(0))).over(tot))
      .select(col("event_type"), col("stat_obs"), col("n_extreme"),
        col("p_value"), col("bh_rank"), col("bh_threshold"),
        (col("bh_rank") <= col("k_max")).as("rejected"))
  }

  /** Cochran–Mantel–Haenszel pooled odds ratio across strata
    * (Mantel & Haenszel 1959) for a BINARY per-user outcome — the
    * stratified 2x2 readout that [[postStratifiedAte]]'s mean form
    * can't give: "does treatment raise the odds of converting at all,
    * net of the pre-exposure stratum". Strata are the capped pre-cutoff
    * activity count (the x219 convention); the outcome is whether the
    * user has any `convType` event at/after the cutoff.
    *
    * OR_MH = sum_k(a_k d_k / n_k) / sum_k(b_k c_k / n_k) over the 2x2
    * cells (a=treated-converted, b=treated-not, c=control-converted,
    * d=control-not). Each stratum term is ROUNDED then summed as exact
    * DECIMAL (the x219 fold convention), and the ratio is NULL when the
    * denominator mass is zero (no discordant cells anywhere).
    *
    * 100 TB shape: one per-user partial-agged groupBy, one strata-sized
    * groupBy, one 1-row reduce. Output: one row per stratum (cells +
    * rounded term) with the pooled OR repeated via broadcast — the
    * per-stratum table IS the report an analyst reads. */
  def mantelHaenszel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String, cutoff: String,
      maxStratum: Int = 5, bucketWidth: Int = 1): DataFrame = {
    require(maxStratum >= 1, "need at least 2 strata (0..max)")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1: $bucketWidth")
    val d = (c: Column) => c.cast(DoubleType)
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val cut = lit(cutoff).cast("timestamp")
    val perUser = events.groupBy(col(userCol))
      .agg(sum(when(col(tsCol) < cut, 1L).otherwise(0L)).as("c_pre"),
        max(when(col(tsCol) >= cut && col(typeCol) === convType, 1L)
          .otherwise(0L)).as("conv"))
      .withColumn("arm", armOf(col(userCol), 2))
      // bucketWidth coarsens the stratum so heavy-activity logs (where
      // raw c_pre would cap every user into one stratum) still stratify
      .withColumn("stratum",
        least(expr(s"c_pre div ${bucketWidth}L"), lit(maxStratum.toLong)))
    val cells = perUser.groupBy(col("stratum"))
      .agg(
        sum(when(col("arm") === 1L && col("conv") === 1L, 1L).otherwise(0L))
          .as("a"),
        sum(when(col("arm") === 1L && col("conv") === 0L, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("arm") === 0L && col("conv") === 1L, 1L).otherwise(0L))
          .as("c"),
        sum(when(col("arm") === 0L && col("conv") === 0L, 1L).otherwise(0L))
          .as("dd"))
      .withColumn("n", col("a") + col("b") + col("c") + col("dd"))
      .withColumn("num_term", round(d(col("a")) * d(col("dd")) / d(col("n")), 6))
      .withColumn("den_term", round(d(col("b")) * d(col("c")) / d(col("n")), 6))
    // decimal -> double via string (the x219 convention)
    val toD = (c: Column) => c.cast("string").cast("double")
    val pooled = cells.agg(
        sum(col("num_term").cast(dec)).as("num_dec"),
        sum(col("den_term").cast(dec)).as("den_dec"))
      .select(
        when(toD(col("den_dec")) === 0.0, lit(null).cast(DoubleType))
          .otherwise(round(toD(col("num_dec")) / toD(col("den_dec")), 6))
          .as("or_mh"))
    cells.crossJoin(broadcast(pooled))
      .select(col("stratum"), col("a").as("n_treated_conv"),
        col("b").as("n_treated_not"), col("c").as("n_control_conv"),
        col("dd").as("n_control_not"), col("num_term"), col("den_term"),
        col("or_mh"))
  }

  /** Raking / iterative proportional fitting (Deming & Stephan 1940):
    * calibrate per-cell sample weights so the weighted A and B margins
    * match a reference population's margins — the standard
    * post-stratification-on-two-margins adjustment when the joint
    * (A x B) population table is unknown but both marginals are. The
    * survey-calibration companion to [[postStratifiedAte]] (which needs
    * the joint strata) and [[covariateBalance]] (which only DETECTS the
    * imbalance raking removes).
    *
    * Cross-engine determinism, the [[MarkovAttribution]] discipline:
    * the cell table is |A| x |B| (bounded), so the solve runs on the
    * driver with a PINNED iteration order that generated SQL can unroll
    * verbatim. Each half-step scales w by
    * tau_a / (current row mass) and ROUNDS to the 1e-6 grid; row masses
    * are EXACT integer sums of round(w * 1e6) * n (micro-units), so no
    * aggregate of doubles exists anywhere — any engine replays the
    * fixed point bit-identically. tau folds as
    * (t_a * N_sample) / T_pop in one pinned double expression.
    * Conventions: a cell whose margin has zero target mass pins w = 0;
    * a zero current row mass leaves w unchanged. Micro-unit row masses
    * stay inside BIGINT while Σ w·n per margin <= 9e12 — comfortable
    * for survey-scale weights at any corpus size (weights are O(1-100),
    * cells partial-agg the corpus first).
    *
    * 100 TB shape: the corpus reduces to the cell/margin frames via
    * partial-agged groupBys BEFORE this runs; the solve itself touches
    * only those bounded frames. Output: one row per sample cell
    * (a, b, n, weight), a/b stringified. */
  def rakeWeights(cells: DataFrame, aCol: String, bCol: String,
      nCol: String, targetA: DataFrame, targetB: DataFrame, tCol: String,
      iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 32, s"iters must be in [1,32]: $iters")
    val spark = cells.sparkSession
    import spark.implicits._
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // ONE bounded collect for all three frames (|A|x|B| cells plus
    // |A| + |B| margin rows), tag-unioned: the cell and margin frames
    // usually share their upstream (x228 derives all three from one
    // user-level join), so a single action lets exchange reuse compute
    // that upstream once — three separate collects re-ran it three
    // times (round-10 fixed-mass shave)
    val tagged = cells.select(lit(0).as("__tag"),
        col(aCol).cast("string").as("__k1"),
        col(bCol).cast("string").as("__k2"), col(nCol).cast("long").as("__n"))
      .unionAll(targetA.select(lit(1).as("__tag"),
        col(aCol).cast("string").as("__k1"),
        lit(null).cast("string").as("__k2"), col(tCol).cast("long").as("__n")))
      .unionAll(targetB.select(lit(2).as("__tag"),
        lit(null).cast("string").as("__k1"),
        col(bCol).cast("string").as("__k2"), col(tCol).cast("long").as("__n")))
      .collect()
    val cs = tagged.filter(_.getInt(0) == 0)
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val ta = tagged.filter(_.getInt(0) == 1)
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    val tb = tagged.filter(_.getInt(0) == 2)
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    val nS = cs.map(_._3).sum
    val (tpa, tpb) = (ta.values.sum, tb.values.sum)
    var w = cs.map(_ => 1.0)
    def halfStep(key: ((String, String, Long)) => String,
        target: Map[String, Long], tPop: Long): Unit = {
      val mass = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      cs.zipWithIndex.foreach { case (cell, i) =>
        mass(key(cell)) += math.round(w(i) * 1e6) * cell._3
      }
      w = cs.zipWithIndex.map { case (cell, i) =>
        val t = target.getOrElse(key(cell), 0L)
        val tau = t.toDouble * nS.toDouble / tPop.toDouble
        val m = mass(key(cell))
        if (t == 0L) 0.0
        else if (m == 0L) w(i)
        else r6(w(i) * tau * 1e6 / m.toDouble)
      }
    }
    for (_ <- 0 until iters) {
      halfStep(_._1, ta, tpa)
      halfStep(_._2, tb, tpb)
    }
    cs.zipWithIndex.map { case ((a, b, n), i) => (a, b, n, w(i)) }.toSeq
      .toDF(aCol, bCol, nCol, "weight")
  }

  /** Group-sequential monitoring at K=5 equally-spaced looks with the
    * O'Brien-Fleming two-sided 5% z boundaries (O'Brien & Fleming 1979;
    * constants from Jennison & Turnbull 2000: 4.562, 3.226, 2.634,
    * 2.281, 2.040 = 2.040·sqrt(5/k)) — the FIXED-SCHEDULE sequential
    * design that complements [[msprt]]'s always-valid continuous
    * monitoring: spend almost no alpha early, keep the final look near
    * the fixed-sample 1.96. Looks are event-time quintile cutoffs
    * computed with exact integer microsecond division; at look k a
    * user is enrolled if their FIRST event precedes the cutoff and
    * converted if their first `convertType` event does. The z is the
    * pooled two-proportion statistic from exact integer counts, NULL
    * when either arm is empty or the pooled rate is degenerate.
    *
    * 100 TB shape: one per-user partial agg, a 5-row broadcast
    * inequality join (fan-out <= 5x users) into a 5-row look frame —
    * no row-scale sort or window anywhere. */
  def groupSequential(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convertType: String): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("first_us"),
        min(when(col(typeCol) === convertType,
          unix_micros(col(tsCol)))).as("purch_us"))
      .withColumn("arm", armOf(col(userCol), 2))
    val range1 = events.agg(min(unix_micros(col(tsCol))).as("lo"),
      max(unix_micros(col(tsCol))).as("hi"))
    groupSequentialFold(perUser, range1)
  }

  /** The look-table fold shared by [[groupSequential]] and the x244
    * streaming twin's dashboard replay
    * ([[graft.streaming.EventStreams.groupSequentialStream]]): given the
    * per-user (arm, first_us, purch_us) frame and the 1-row (lo, hi)
    * event-time range, emits the 5-look O'Brien-Fleming table. Keeping
    * ONE fold is the parity argument — both consumers produce
    * row-identical tables because they run identical expressions
    * (the wilsonOnCounts convention). */
  private[graft] def groupSequentialFold(perUser: DataFrame,
      range1: DataFrame): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val bounds = Seq(4.562, 3.226, 2.634, 2.281, 2.040)
    val looks = range1.select(col("lo"), col("hi"),
        explode(sequence(lit(1L), lit(5L))).as("look"))
      .select(col("look"), (col("lo") + call_function("div",
        (col("hi") - col("lo")) * col("look"), lit(5L))).as("cut_us"))
    val byLook = perUser
      .join(broadcast(looks), col("first_us") <= col("cut_us"))
      .groupBy(col("look"))
      .agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0L && col("purch_us").isNotNull &&
          col("purch_us") <= col("cut_us"), 1L).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1L && col("purch_us").isNotNull &&
          col("purch_us") <= col("cut_us"), 1L).otherwise(0L)).as("c1"))
    val pbar = d(col("c0") + col("c1")) / d(col("n0") + col("n1"))
    val seRaw = sqrt(pbar * (lit(1.0) - pbar) *
      (lit(1.0) / d(col("n1")) + lit(1.0) / d(col("n0"))))
    val zRaw = when(col("n0") === 0L || col("n1") === 0L,
        lit(null).cast(DoubleType))
      .otherwise(when(seRaw === 0.0, lit(null).cast(DoubleType))
        .otherwise((d(col("c1")) / d(col("n1")) -
          d(col("c0")) / d(col("n0"))) / seRaw))
    val bound = element_at(
      array(bounds.map(lit): _*), col("look").cast("int"))
    byLook.select(col("look"), col("n0"), col("n1"),
        col("c0").as("conv0"), col("c1").as("conv1"),
        round(zRaw, 6).as("z"), bound.as("bound"),
        (abs(zRaw) > bound).as("crossed"))
      .orderBy(col("look"))
  }

  /** Instrumental-variable (Wald/LATE) estimator with a first-stage
    * strength readout (Angrist, Imbens & Rubin 1996). The instrument
    * Z is the deterministic hash arm ([[armOf]]) — an ENCOURAGEMENT,
    * not the treatment: uptake T is whatever the user actually did
    * (`uptake` predicate on the event log) and compliance is partial,
    * so the naive per-T contrast is confounded while the Z contrast is
    * not. LATE = ITT / first-stage = (E[Y|Z=1]-E[Y|Z=0]) /
    * (E[T|Z=1]-E[T|Z=0]), pinned NULL when the first stage is exactly
    * 0; the weak-instrument F statistic fs^2 / (p1(1-p1)/n1 +
    * p0(1-p0)/n0) uses the exact binomial variance of the binary
    * uptake (pinned NULL when that variance is 0), with the classic
    * F < 10 weak flag (Staiger & Stock 1997).
    *
    * Everything is integer counts per arm until the final divisions:
    * one per-user groupBy, one 2-row arm agg, one 1-row reduce —
    * nothing row-scale past the first partial agg. */
  def ivWald(events: DataFrame, userCol: String, typeCol: String,
      uptakeType: String, outcomeType: String): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val perUser = events.groupBy(col(userCol))
      .agg(max(when(col(typeCol) === uptakeType, 1L).otherwise(0L))
          .as("tr"),
        sum(when(col(typeCol) === outcomeType, 1L).otherwise(0L))
          .as("y"))
      .withColumn("arm", armOf(col(userCol), 2))
    val perArm = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("tr")).as("kt"),
        sum(col("y")).as("sy"))
    def arm(t: Int): DataFrame =
      perArm.filter(col("arm") === t.toLong)
        .select(col("n").as(s"n$t"), col("kt").as(s"kt$t"),
          col("sy").as(s"sy$t"))
    val j = arm(0).crossJoin(broadcast(arm(1))) // 1-row x 1-row
      .withColumn("itt_raw",
        d(col("sy1")) / d(col("n1")) - d(col("sy0")) / d(col("n0")))
      .withColumn("p1", d(col("kt1")) / d(col("n1")))
      .withColumn("p0", d(col("kt0")) / d(col("n0")))
      .withColumn("fs_raw", col("p1") - col("p0"))
      .withColumn("fs_var",
        col("p1") * (lit(1.0) - col("p1")) / d(col("n1")) +
          col("p0") * (lit(1.0) - col("p0")) / d(col("n0")))
    j.select(col("n0"), col("n1"),
      round(col("itt_raw"), 6).as("itt"),
      round(col("fs_raw"), 6).as("first_stage"),
      round(when(col("fs_raw") === 0.0, lit(null).cast(DoubleType))
        .otherwise(col("itt_raw") / col("fs_raw")), 6).as("late"),
      round(when(col("fs_var") === 0.0, lit(null).cast(DoubleType))
        .otherwise(col("fs_raw") * col("fs_raw") / col("fs_var")), 6)
        .as("f_stat"),
      (when(col("fs_var") === 0.0, lit(null).cast(DoubleType))
        .otherwise(col("fs_raw") * col("fs_raw") / col("fs_var")) <
        lit(10.0)).as("weak_instrument"))
  }

  /** Wilson score interval (Wilson 1927) on each arm's user-level
    * conversion rate at the pinned two-sided 5% z = 1.96 — the
    * guardrail interval that stays inside [0,1] and behaves at small
    * n/extreme p where the Wald interval collapses. Output one row per
    * arm: (arm, n, k, rate, lo, hi), all rates rounded at 6. Integer
    * (n, k) per arm until the final per-row doubles; one per-user
    * groupBy then a 2-row frame. Streaming twin:
    * [[graft.streaming.EventStreams.wilsonGuardrailStream]]. */
  /** Two-PROPORTION power / minimum-detectable-effect readout — the
    * conversion-rate sibling of [[powerMde]] (that op reads the
    * observed per-arm variance of the count metric; this one uses the
    * exact binomial variance of a binary conversion, which is what a
    * rate experiment's sizing memo quotes). Classic pooled formula
    * (Cohen 1988): mde_abs = (z_{1-α/2} + z_{power}) ·
    * sqrt(p̄(1-p̄)(1/n0 + 1/n1)) with p̄ from the exact per-arm user
    * counts, pinned z constants (two-sided 5%: 1.959964; 80% power:
    * 0.841621) so both engines evaluate the identical expression, and
    * mde_rel = mde_abs over the CONTROL rate (NULL when control has no
    * conversions). sqrt is the single transcendental, at the edge.
    *
    * 100 TB shape: one per-user partial agg, then ONE conditional
    * 1-row pivot over the arm frame (round 10 — previously two filters
    * cross-joined, which planned the per-user subtree twice and, if
    * every user hashed to one arm, returned an EMPTY frame instead of
    * a row with NULL mde; the conditional sums yield NULL for the
    * missing arm, which propagates to NULL rates/mde as a sizing memo
    * should read). Output one row:
    * (n0, n1, conv0, conv1, p_pool, mde_abs, mde_rel). */
  def powerMdeProportion(events: DataFrame, userCol: String,
      typeCol: String, convertType: String, zAlpha: Double = 1.959964,
      zPower: Double = 0.841621): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val perArm = events.groupBy(col(userCol))
      .agg(max(when(col(typeCol) === convertType, 1L).otherwise(0L))
        .as("conv"))
      .withColumn("arm", armOf(col(userCol), 2))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
    val pbar = d(col("k0") + col("k1")) / d(col("n0") + col("n1"))
    val mde = lit(zAlpha + zPower) *
      sqrt(pbar * (lit(1.0) - pbar) *
        (lit(1.0) / d(col("n0")) + lit(1.0) / d(col("n1"))))
    perArm.agg(
        sum(when(col("arm") === 0L, col("n"))).as("n0"),
        sum(when(col("arm") === 1L, col("n"))).as("n1"),
        sum(when(col("arm") === 0L, col("k"))).as("k0"),
        sum(when(col("arm") === 1L, col("k"))).as("k1"))
      .select(col("n0"), col("n1"), col("k0").as("conv0"),
        col("k1").as("conv1"), round(pbar, 6).as("p_pool"),
        round(mde, 6).as("mde_abs"),
        round(when(col("k0") === 0L, lit(null).cast(DoubleType))
          .otherwise(mde / (d(col("k0")) / d(col("n0")))), 6)
          .as("mde_rel"))
  }

  def wilsonGuardrail(events: DataFrame, userCol: String,
      typeCol: String, convertType: String, z: Double = 1.96)
      : DataFrame = {
    val perArm = events.groupBy(col(userCol))
      .agg(max(when(col(typeCol) === convertType, 1L).otherwise(0L))
        .as("conv"))
      .withColumn("arm", armOf(col(userCol), 2))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
    wilsonOnCounts(perArm, z).orderBy(col("arm"))
  }

  /** The Wilson interval columns from an exact (n, k) count frame —
    * shared by the batch guardrail and its streaming twin so parity is
    * by construction. */
  def wilsonOnCounts(counts: DataFrame, z: Double): DataFrame = {
    val d = (c: Column) => c.cast(DoubleType)
    val z2 = lit(z * z)
    val p = d(col("k")) / d(col("n"))
    val denom = lit(1.0) + z2 / d(col("n"))
    val center = (p + z2 / (lit(2.0) * d(col("n")))) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / d(col("n")) +
      z2 / (lit(4.0) * d(col("n")) * d(col("n")))) / denom
    counts.select(col("arm"), col("n"), col("k"),
      round(p, 6).as("rate"),
      round(center - half, 6).as("lo"),
      round(center + half, 6).as("hi"))
  }

  /** 2x2 factorial readout: two simultaneous treatments assigned from
    * INDEPENDENT bits of the same user hash (bit 0 and bit 1 of
    * md5 — users land in four cells 00/01/10/11), per-cell conversion
    * rates, both main effects, and the INTERACTION
    * (p11 - p10 - p01 + p00) — the readout that tells you whether two
    * features tested together help more (or less) than the sum of
    * their solo effects, which two separate A/B tests structurally
    * cannot see (Fisher 1935; Kohavi et al. on overlapping
    * experiments).
    *
    * Output one row: per-cell (n_ab, k_ab, p_ab) for ab in
    * {00,01,10,11}, then main_a = (p10+p11)/2 - (p00+p01)/2, main_b
    * symmetric, and interaction — all round-6 from exact integer
    * (n, k) cells.
    *
    * 100 TB shape: one per-user partial agg into the 4-cell frame,
    * then scalar arithmetic. */
  def factorial2(events: DataFrame, userCol: String, typeCol: String,
      convertType: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val h = graft.functions.TextFunctions.md5Long(col(userCol))
    val perUser = events.groupBy(col(userCol))
      .agg(max(when(col(typeCol) === convertType, 1L).otherwise(0L))
        .as("conv"))
      .withColumn("a", pmod(h, lit(2L)))
      .withColumn("b", pmod(call_function("div", h, lit(2L)), lit(2L)))
    val cells = perUser.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
    def cell(a: Int, b: Int, c: String): Column =
      sum(when(col("a") === a.toLong && col("b") === b.toLong,
        col(c))).as(s"${c}$a$b")
    val wide = cells.agg(
      cell(0, 0, "n"), cell(0, 0, "k"), cell(0, 1, "n"), cell(0, 1, "k"),
      cell(1, 0, "n"), cell(1, 0, "k"), cell(1, 1, "n"), cell(1, 1, "k"))
    def p(a: Int, b: Int): Column =
      d(col(s"k$a$b")) / d(col(s"n$a$b"))
    wide.select(
      col("n00"), col("k00"), round(p(0, 0), 6).as("p00"),
      col("n01"), col("k01"), round(p(0, 1), 6).as("p01"),
      col("n10"), col("k10"), round(p(1, 0), 6).as("p10"),
      col("n11"), col("k11"), round(p(1, 1), 6).as("p11"),
      round((p(1, 0) + p(1, 1)) / 2 - (p(0, 0) + p(0, 1)) / 2, 6)
        .as("main_a"),
      round((p(0, 1) + p(1, 1)) / 2 - (p(0, 0) + p(1, 0)) / 2, 6)
        .as("main_b"),
      round(p(1, 1) - p(1, 0) - p(0, 1) + p(0, 0), 6)
        .as("interaction"))
  }
}
