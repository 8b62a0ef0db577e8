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
}
