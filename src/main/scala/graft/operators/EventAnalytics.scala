package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Event-sequence analytics: ordered-funnel completion and retention
  * cohorts over an event log. Complements [[Temporal.sessionize]] (gap
  * sessions), per-key lead/lag (x27), and the streaming attribution join
  * (st4): funnels ask "how deep into an ordered step sequence did each
  * user get", cohorts ask "of the users first seen in bucket B, how many
  * were active k buckets later" — the two staple product/trace-analysis
  * queries neither of those shapes answers.
  */
object EventAnalytics {

  /** Strict-order funnel: for each user, the greedy earliest walk through
    * `steps` — step 1 at its minimum timestamp t1, step i+1 at the minimum
    * timestamp strictly after step i's — and how deep it got. Greedy
    * earliest is optimal for an unbounded-horizon funnel: taking the
    * earliest valid occurrence of each step only loosens the constraint
    * on every later step, so no other walk reaches deeper.
    *
    * 100 TB shape: ONE shuffle — events are filtered to the step types in
    * a narrow scan (non-step rows never move), then a single partial-agged
    * `collect_list` per user; the walk itself is a per-row array fold
    * (`aggregate`) over each user's own sorted events, state O(1),
    * per-user cost O(own events). No per-step join chain (k steps would be
    * k corpus shuffles) and no cross-user window.
    *
    * Users with at least one event of ANY step type appear in the output;
    * a user who never fired step 1 reports steps_completed = 0 with null
    * timestamps. Ties: an event at exactly the previous step's timestamp
    * does NOT advance the walk (strictly-after semantics, the common
    * funnel definition). Output: (user, steps_completed long,
    * first_us long, last_us long) — exact integer microseconds.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    // (ts, 1-based step index); sort_array orders by (ts, idx) so a
    // same-instant earlier step sorts before a later one
    val ev = struct(unix_micros(col(tsCol)).as("ts"),
      array_position(typedLit(steps), col(typeCol)).as("idx"))
    val init = struct(lit(0L).as("depth"),
      lit(null).cast(LongType).as("first_us"),
      lit(null).cast(LongType).as("last_us"))
    val walk = (acc: Column, e: Column) => {
      val take = e("idx") === acc("depth") + 1L &&
        (acc("depth") === 0L || e("ts") > acc("last_us"))
      when(take, struct((acc("depth") + 1L).as("depth"),
        when(acc("depth") === 0L, e("ts")).otherwise(acc("first_us"))
          .as("first_us"),
        e("ts").as("last_us")))
        .otherwise(acc)
    }
    events.select(col(userCol), ev.as("__e"))
      .filter(col("__e")("idx") > 0L)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(col(userCol), aggregate(col("__evs"), init, walk).as("__f"))
      .select(col(userCol), col("__f")("depth").as("steps_completed"),
        col("__f")("first_us").as("first_us"),
        col("__f")("last_us").as("last_us"))
  }

  /** Windowed funnel (the ClickHouse `windowFunnel` shape): deepest step
    * sequence whose FIRST and LAST events are at most `windowSeconds`
    * apart, with non-strict time ordering (an event at the same instant
    * as the previous step may chain — the windowFunnel default). The
    * unbounded [[funnel]] asks "did they ever get there"; this asks "did
    * they get there within an hour" — the conversion-rate form.
    *
    * Greedy-earliest is NOT optimal under a deadline (a later step-1
    * occurrence can complete inside ITS window where the earliest can't),
    * so the walk is a small DP: state = per-depth LATEST chain-start
    * time. Processing events in (ts, idx) order, a chain reaching depth
    * d-1 extends iff ts - start <= window, and among such chains the
    * latest start strictly dominates (loosest window for every later
    * step; the d-1th event time is <= ts for all processed chains). The
    * state is k longs per user — same O(k) bound as the unbounded walk.
    *
    * 100 TB shape: identical to [[funnel]] — one narrow step-filtered
    * scan, ONE partial-agged collect_list shuffle, per-row array fold.
    * Output: (user, steps_completed long); users with >= 1 step-typed
    * event appear, depth 0 when step 1 never fired.
    */
  def funnelWithin(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    require(windowSeconds >= 1, "windowSeconds must be >= 1")
    val k = steps.size
    val winUs = windowSeconds * 1000000L
    val ev = struct(unix_micros(col(tsCol)).as("ts"),
      array_position(typedLit(steps), col(typeCol)).as("idx"))
    // starts[d-1] = latest chain-start reaching depth d (null = unreached)
    val init = typedLit(Seq.fill(k)(null.asInstanceOf[java.lang.Long]))
    val walk = (acc: Column, e: Column) =>
      transform(sequence(lit(1), lit(k)), d => {
        val cur = element_at(acc, d) // greatest() skips nulls
        when(d === e("idx"),
          when(d === 1, greatest(cur, e("ts")))
            .otherwise {
              val prev = element_at(acc, d - 1)
              when(prev.isNotNull && e("ts") - prev <= winUs,
                greatest(cur, prev)).otherwise(cur)
            })
          .otherwise(cur)
      })
    events.select(col(userCol), ev.as("__e"))
      .filter(col("__e")("idx") > 0L)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(col(userCol),
        size(filter(aggregate(col("__evs"), init, walk),
          x => x.isNotNull)).cast(LongType).as("steps_completed"))
  }

  /** Retention cohorts: bucket time into `bucketSeconds`-wide windows
    * (exact integer micros via IntegralDivide — no double rounding at
    * bucket edges; DuckDB `epoch_us(...) // ...`), cohort each user by
    * the bucket of their first event, and count distinct active users per
    * (cohort bucket, bucket offset). Offset 0 is the cohort size itself.
    *
    * 100 TB shape: ONE corpus shuffle — a single partial-agged
    * groupBy(user) carries both min(bucket) and collect_set(bucket)
    * (per-user set bounded by the number of buckets, not events; map-side
    * merge dedups before the shuffle). The explode and final agg run on
    * the user-bounded frame, output is cohorts x offsets rows. The naive
    * shape (first-seen agg + corpus self-join + COUNT(DISTINCT)) is two
    * corpus shuffles plus an Expand; this is one, with no Expand.
    * Output: (cohort_bucket long, bucket_offset long, n_users long).
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      bucketSeconds: Long = 604800L): DataFrame = {
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val bk = call_function("div", unix_micros(col(tsCol)),
      lit(bucketSeconds * 1000000L))
    events.select(col(userCol).as("__u"), bk.as("__bk"))
      .groupBy(col("__u"))
      .agg(min(col("__bk")).as("cohort_bucket"),
        collect_set(col("__bk")).as("__bks"))
      .select(col("cohort_bucket"), explode(col("__bks")).as("__bk"))
      .groupBy(col("cohort_bucket"),
        (col("__bk") - col("cohort_bucket")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Volume-anomaly detection: flag the (type, bucket) cells whose event
    * count deviates from that type's mean by more than `sigma` population
    * standard deviations — the monitoring staple over an event log
    * ("which hours spiked").
    *
    * The z-score test is INTEGER-EXACT: |cnt - S/n| > sigma*sqrt(SS/n -
    * S²/n²) is evaluated as (n*cnt - S)² > sigma²*(n*SS - S²) — both
    * sides products of BIGINT aggregates in DECIMAL(38,0), so the flag
    * set is bit-identical across engines (a double sqrt/mean would flip
    * borderline cells on summation-order 1-ulp noise and is unhashable
    * cross-engine). Constant-volume types have zero variance and zero
    * deviation: nothing flags.
    *
    * 100 TB shape: ONE corpus shuffle to (type, bucket) counts
    * (partial-agged — the wire carries cells, not events); the per-type
    * stats frame is |types| rows, broadcast back. No window, no
    * self-join. Output: (event_type, bucket_us long, cnt long), the
    * flagged cells only.
    */
  def countOutliers(events: DataFrame, typeCol: String, tsCol: String,
      bucketSeconds: Long = 3600L, sigma: Int = 2): DataFrame = {
    require(bucketSeconds >= 1L && sigma >= 1, "bucketSeconds and sigma must be >= 1")
    val busc = bucketSeconds * 1000000L
    val bk = call_function("div", unix_micros(col(tsCol)), lit(busc))
    val cells = events
      .select(col(typeCol).as("event_type"), bk.as("bk"))
      .groupBy(col("event_type"), col("bk"))
      .agg(count(lit(1)).as("cnt"))
    val stats = cells.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("ss"))
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val diff = (col("n") * col("cnt") - col("s")).cast(d38)
    cells.join(broadcast(stats), Seq("event_type"))
      .filter(diff * diff >
        lit(sigma.toLong * sigma).cast(d38) *
          (col("n").cast(d38) * col("ss").cast(d38) -
           col("s").cast(d38) * col("s").cast(d38)))
      .select(col("event_type"), (col("bk") * lit(busc)).as("bucket_us"),
        col("cnt"))
  }

  /** Top-k most frequent length-3 event paths (the order-2 sequence view;
    * [[transitionMatrix]] is order-1): consecutive type triples per user
    * timeline, counted corpus-wide. One keyed window (two leads share the
    * same frame — a single sort/shuffle), one partial-agged path count,
    * TakeOrdered top-k. Output: (path "a>b>c", n, rank). */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val paths = events
      .select(col(userCol), col(typeCol).as("t0"), col(tsCol), col(tieCol))
      .withColumn("t1", lead(col("t0"), 1).over(perUser))
      .withColumn("t2", lead(col("t0"), 2).over(perUser))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
      .select(concat_ws(">", col("t0"), col("t1"), col("t2")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
    // the k surviving rows arrive sorted; their row numbers ARE the ranks
    graft.plans.RowNum.assign(paths)
      .withColumnRenamed(graft.plans.Events.RowNumCol, "rank")
      .select(col("path"), col("n"), col("rank"))
      .orderBy(col("rank"))
  }

  /** Multi-model touch attribution: for every conversion event, the
    * touch events of the same user inside the lookback window, credited
    * per channel under three INTEGER-EXACT models — first-touch,
    * last-touch, and participation (>=1 touch in the window). Linear
    * (1/n fractional) credit is deliberately absent: summing corpus-many
    * 1/n doubles is summation-order-dependent and can't be gated exactly;
    * the three count models answer the same ranking questions.
    *
    * 100 TB shape: the conversion-touch pairing is an equi-join on user
    * with a residual time-band predicate — per-user work bounded by that
    * user's own events times the window, never a cross-user product. The
    * first/last argmin/argmax are partial-agged struct extremes per
    * conversion (x69's pattern), then per-channel counts — the output
    * frame is |channels| rows.
    */
  def touchAttribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, convType: String, touchType: String,
      channel: Column, windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 1, "windowSeconds must be >= 1")
    val winUs = windowSeconds * 1000000L
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("conv_us"),
        col(tieCol).as("conv_id"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("touch_us"),
        col(tieCol).as("touch_id"), channel.as("channel"))
    val paired = conv.join(touch, Seq("__u"))
      .filter(col("touch_us") <= col("conv_us") &&
        col("conv_us") - col("touch_us") <= winUs)
      .select(col("conv_id"), col("channel"), col("touch_us"), col("touch_id"))
    def extreme(agg: Column => Column, name: String): DataFrame = paired
      .groupBy(col("conv_id"))
      .agg(agg(struct(col("touch_us"), col("touch_id"), col("channel")))
        .as("w"))
      .groupBy(col("w")("channel").as("channel"))
      .agg(count(lit(1)).as(name))
    val firsts = extreme(min, "first_touch")
    val lasts = extreme(max, "last_touch")
    val parts = paired.select(col("conv_id"), col("channel")).distinct()
      .groupBy(col("channel")).agg(count(lit(1)).as("participating"))
    firsts.join(lasts, Seq("channel"), "full_outer")
      .join(parts, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        coalesce(col("participating"), lit(0L)).as("participating"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for every ordered pair of consecutive event types (within one user's
    * timeline), the transition count and the conditional probability
    * P(next | current). The staple "where do users go from here" model
    * behind next-event prediction, anomalous-flow detection, and
    * clickstream simulation.
    *
    * 100 TB shape: one keyed window (shuffle by user — each user's
    * timeline sorts independently, no global order), then one partial-agged
    * shuffle to (cur, next) cells. The probability normalization runs on
    * the |types|² cell frame — k² rows, not events — so the second window
    * is free. The tie column makes the per-user order total (two events at
    * the same instant would otherwise make `lead` nondeterministic).
    *
    * Probabilities are exact-integer divisions done once in double
    * (cnt/total, both exact BIGINTs — a single correctly-rounded IEEE op,
    * reproducible across engines).
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val cells = events
      .select(col(userCol), col(typeCol).as("cur"), col(tsCol), col(tieCol))
      .withColumn("nxt", lead(col("cur"), 1).over(perUser))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt"))
      .agg(count(lit(1)).as("cnt"))
    val perCur = Window.partitionBy(col("cur"))
    cells.withColumn("prob",
      col("cnt").cast(DoubleType) /
        sum(col("cnt")).over(perCur).cast(DoubleType))
  }

  /** Temporal-concentration entropy per event type: the Shannon entropy
    * of each type's hour-of-week distribution (x135's cells), in bits —
    * a SCHEDULED source (cron ingests, batch beacons) concentrates its
    * mass in a few cells (low entropy) where organic traffic spreads
    * (high); the source-level scheduling detector next to x97's per-user
    * gap regularity. Cells are exact counts; each type's entropy folds
    * its <= 168 cells ON THE DRIVER in canonical (dow, hour) order (the
    * x91 discipline — types x 168 is bounded), -Σ p·log2 p, rounded to
    * 6. Output: (event_type, n_events, n_cells, entropy_bits). */
  def typeTimeEntropy(events: DataFrame, typeCol: String,
      tsCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val us = unix_micros(col(tsCol))
    val day = call_function("div", us, lit(86400000000L))
    val cells = events.select(col(typeCol).cast("string").as("t"),
        pmod(day + 4L, lit(7L)).as("dow"),
        call_function("div", pmod(us, lit(86400000000L)),
          lit(3600000000L)).as("hour"))
      .groupBy(col("t"), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val byType = cells.groupBy(_._1).toSeq.sortBy(_._1)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    byType.map { case (t, cs) =>
      val total = cs.map(_._4).sum
      val h = cs.sortBy(c => (c._2, c._3)).foldLeft(0.0) { (acc, c) =>
        val p = c._4.toDouble / total.toDouble
        acc - p * (math.log(p) / math.log(2.0))
      }
      (t, total, cs.length.toLong, r6(h))
    }.toDF("event_type", "n_events", "n_cells", "entropy_bits")
  }

  /** Top-k behavioral SEGMENT signatures: each user's distinct
    * event-type SET, canonicalized (sorted, comma-joined) and counted
    * corpus-wide — the unsupervised segmentation read before anyone
    * hand-defines personas ("viewers who never click" is a signature,
    * not a hypothesis). The set per user is sort-canonical so the
    * signature is partitioning- and arrival-order-proof. One distinct
    * (user, type) reduction, one per-user set agg, one partial-agged
    * signature count, TakeOrdered. Output: (rk, signature, n_types,
    * n_users). */
  def segmentSignatures(events: DataFrame, userCol: String,
      typeCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val sig = events.select(col(userCol).as("u"), col(typeCol).as("t"))
      .distinct()
      .groupBy(col("u"))
      .agg(array_join(array_sort(collect_set(col("t"))), ",").as("signature"),
        count(lit(1)).as("n_types"))
    val top = sig.groupBy(col("signature"), col("n_types"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("signature").asc)
      .limit(k)
    // k-row frame after the TakeOrdered limit
    val w = Window.orderBy(col("n_users").desc, col("signature").asc)
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("rk"), col("signature"), col("n_types"), col("n_users"))
  }

  /** Out-of-orderness report — THE watermark-sizing diagnostic: in
    * arrival order (the ingestion sequence column), how often does event
    * time step BACKWARD, and by how much at worst. A watermark delay
    * below the observed regression tail silently DROPS those events from
    * every windowed aggregate; above it, state lingers longer than
    * needed — this report is how the delay is chosen from data instead
    * of folklore. Measured per user (the keyed lag window — arrival
    * order is only meaningful within a partition's sequence at scale)
    * and aggregated: pair count, inversion count/rate, and the maximum
    * backward step in exact microseconds. Output: one row (n_pairs,
    * n_inversions, inversion_rate, max_regression_us). */
  def outOfOrderness(events: DataFrame, userCol: String, seqCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    val w = Window.partitionBy(col(userCol)).orderBy(col(seqCol))
    val pairs = events
      .select(col(userCol), col(seqCol), unix_micros(col(tsCol)).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .filter(col("prev").isNotNull)
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("us") < col("prev"), 1L).otherwise(0L))
          .as("n_inversions"),
        max(greatest(col("prev") - col("us"), lit(0L)))
          .as("max_regression_us"))
      .select(col("n_pairs"), col("n_inversions"),
        (col("n_inversions").cast(DoubleType) /
          col("n_pairs").cast(DoubleType)).as("inversion_rate"),
        col("max_regression_us"))
  }

  /** Hour-of-week seasonal profile: event counts per (day-of-week, hour)
    * cell — the traffic fingerprint capacity planning and the x66/x129
    * anomaly baselines are read against (a Tuesday-3am spike means
    * something different from a Monday-9am one). Day-of-week and hour
    * derive from INTEGER epoch arithmetic ((days+4) mod 7 with 0=Sunday;
    * 1970-01-01 was a Thursday), not calendar functions — engine
    * conventions for DOW numbering differ (Spark starts Sunday=1,
    * ISO starts Monday=1), epoch division doesn't. One partial-agged
    * groupBy over at most 168 cells. Output: (dow 0-6, hour 0-23, n). */
  def hourOfWeekProfile(events: DataFrame, tsCol: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    val day = call_function("div", us, lit(86400000000L))
    val dow = pmod(day + 4L, lit(7L))
    val hour = call_function("div",
      pmod(us, lit(86400000000L)), lit(3600000000L))
    events.select(dow.as("dow"), hour.as("hour"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"))
  }

  /** Hour-of-week SPIKE cells — [[hourOfWeekProfile]] is the baseline,
    * this is the alarm over it: for each (dow, hour) cell, compare the
    * single worst epoch-week against the cell's all-weeks mean and flag
    * cells whose peak exceeds twice it. The comparison is ALL-INTEGER
    * (max_week · n_weeks > 2 · total — the e9/x142 "twice the mean"
    * recipe), so no engine can disagree on a boundary; the mean's
    * denominator is the GLOBAL distinct epoch-week count (a quiet cell's
    * zero-weeks depress its mean — skipping them would hide a spike in
    * an otherwise-dead hour). Two partial-agged groupBys (week-cell then
    * cell) plus a 1-row distinct-weeks crossJoin. Output: (dow, hour,
    * n_weeks_active, total, max_week, spike). */
  def hourOfWeekAnomaly(events: DataFrame, tsCol: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    val day = call_function("div", us, lit(86400000000L))
    val cells = events.select(
        call_function("div", day, lit(7L)).as("wk"),
        pmod(day + 4L, lit(7L)).as("dow"),
        call_function("div",
          pmod(us, lit(86400000000L)), lit(3600000000L)).as("hour"))
      .groupBy(col("wk"), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val weeks = cells.agg(countDistinct(col("wk")).as("n_weeks"))
    cells.groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_weeks_active"), sum(col("n")).as("total"),
        max(col("n")).as("max_week"))
      .crossJoin(weeks)
      .select(col("dow"), col("hour"), col("n_weeks_active"), col("total"),
        col("max_week"),
        (col("max_week") * col("n_weeks") > col("total") * 2L).as("spike"))
  }

  /** Funnel summary table — [[funnel]]'s per-user depths rolled up to the
    * per-step report a dashboard renders: users reaching each step, the
    * step-over-step conversion rate, and the rate from step 1. One
    * k-row cumulative pass over the depth histogram (k = #steps); rates
    * are single divisions of exact counts. Output: (step 1..k,
    * n_reached, step_rate, overall_rate). */
  def funnelSummary(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    val depths = funnel(events, userCol, typeCol, tsCol, steps)
      .groupBy(col("steps_completed")).agg(count(lit(1)).as("n_at"))
    val spark = events.sparkSession
    import spark.implicits._
    val scaffold = steps.indices.map(i => (i + 1).toLong).toDF("step")
    // k-row frames: the unpartitioned windows are bounded by #steps
    val wDesc = Window.orderBy(col("step").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reached = scaffold
      .join(depths.withColumnRenamed("steps_completed", "step"),
        Seq("step"), "left")
      .withColumn("n_reached", sum(coalesce(col("n_at"), lit(0L))).over(wDesc))
    val wAsc = Window.orderBy(col("step").asc)
    reached
      .withColumn("prev", lag(col("n_reached"), 1).over(wAsc))
      .withColumn("first", first(col("n_reached")).over(
        wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("step"), col("n_reached"),
        when(col("prev").isNull, lit(1.0))
          .otherwise(col("n_reached").cast(DoubleType) /
            col("prev").cast(DoubleType)).as("step_rate"),
        (col("n_reached").cast(DoubleType) /
          col("first").cast(DoubleType)).as("overall_rate"))
  }

  /** Per-bucket churn: of the users active in bucket b−1, how many did
    * NOT return in bucket b — [[retentionCohorts]] asks "who came back
    * k buckets after their FIRST visit"; churn asks the operational
    * inverse, "who just left", the number an alerting dashboard tracks
    * per day. All counts exact; rate is one division.
    *
    * 100 TB shape: the event log reduces to DISTINCT (user, bucket)
    * rows once; the prior-bucket membership test is an equi anti-join on
    * (user, bucket) (shift b−1 → b by projection, no self-join of raw
    * events); per-bucket counts partial-agg on the span-bounded key
    * space. Output: (bucket_us, n_prev_active, n_churned, churn_rate)
    * for every bucket following an active bucket. */
  def churn(events: DataFrame, userCol: String, tsCol: String,
      bucketSeconds: Long): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val busc = bucketSeconds * 1000000L
    val d = events.select(col(userCol).as("u"),
        call_function("div", unix_micros(col(tsCol)), lit(busc)).as("bk"))
      .distinct()
    val shifted = d.select(col("u"), (col("bk") + 1L).as("bk"))
    val prevCounts = shifted.groupBy(col("bk"))
      .agg(count(lit(1)).as("n_prev_active"))
    val churned = shifted.join(d.hint("shuffle_hash"), Seq("u", "bk"),
        "left_anti")
      .groupBy(col("bk")).agg(count(lit(1)).as("n_churned"))
    prevCounts.join(churned, Seq("bk"), "left")
      .select((col("bk") * busc).as("bucket_us"), col("n_prev_active"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"),
        (coalesce(col("n_churned"), lit(0L)).cast(DoubleType) /
          col("n_prev_active").cast(DoubleType)).as("churn_rate"))
  }

  /** New-vs-returning decomposition per bucket — the DAU split every
    * growth dashboard leads with: of the users active in bucket b, how
    * many are seen for the FIRST time. One distinct (user, bucket)
    * reduction; first-seen buckets from a partial-agged min per user,
    * joined back shuffle_hash on the user key (no self-join of raw
    * events, no Expand). Output: (bucket_us, n_active, n_new,
    * n_returning) — exact counts. */
  def newVsReturning(events: DataFrame, userCol: String, tsCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val busc = bucketSeconds * 1000000L
    val d = events.select(col(userCol).as("u"),
        call_function("div", unix_micros(col(tsCol)), lit(busc)).as("bk"))
      .distinct()
    val first = d.groupBy(col("u")).agg(min(col("bk")).as("fb"))
    d.join(first.hint("shuffle_hash"), Seq("u"))
      .groupBy(col("bk"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("fb") === col("bk"), 1L).otherwise(0L)).as("n_new"))
      .select((col("bk") * busc).as("bucket_us"), col("n_active"),
        col("n_new"), (col("n_active") - col("n_new")).as("n_returning"))
  }

  /** Lag-1 autocorrelation of bucketed event volume — "does today's
    * traffic predict tomorrow's": near 1 = strongly trending/seasonal
    * load (capacity plans hold), near 0 = memoryless arrivals, negative
    * = oscillation (retry storms, thundering herds). The one-number
    * time-series diagnostic read next to [[countOutliers]]' spike flags.
    *
    * ALL-INTEGER until the last step: bucket counts are exact BIGINTs
    * over a DENSE generated scaffold (absent buckets are genuine zero
    * days — skipping them would splice non-adjacent days together), the
    * five correlation sums are BIGINT aggregates over the span-bounded
    * pair frame, and r is one fixed-order double formula rounded to 6.
    * One corpus shuffle (the bucket groupBy); everything after is
    * span-sized. Output: (n_pairs, r). */
  def volumeAutocorr(events: DataFrame, tsCol: String,
      bucketSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val busc = bucketSeconds * 1000000L
    val cells = events
      .select(call_function("div", unix_micros(col(tsCol)), lit(busc)).as("bk"))
      .groupBy(col("bk")).agg(count(lit(1)).as("c"))
    val dense = cells.agg(min(col("bk")).as("lo"), max(col("bk")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("bk"))
      .join(cells, Seq("bk"), "left")
      .select(col("bk"), coalesce(col("c"), lit(0L)).as("c"))
    // span-bounded frame: the unpartitioned lead window is fine here
    val w = Window.orderBy(col("bk"))
    val pairs = dense.withColumn("cn", lead(col("c"), 1).over(w))
      .filter(col("cn").isNotNull)
    val s = pairs.agg(count(lit(1)).as("n"),
      sum(col("c")).as("sx"), sum(col("cn")).as("sy"),
      sum(col("c") * col("cn")).as("sxy"),
      sum(col("c") * col("c")).as("sxx"),
      sum(col("cn") * col("cn")).as("syy"))
    val n = col("n").cast(DoubleType)
    def d(c: Column) = c.cast(DoubleType)
    val r = (n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
      (sqrt(n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
        sqrt(n * d(col("syy")) - d(col("sy")) * d(col("sy"))))
    s.select(col("n").as("n_pairs"), round(r, 6).as("r"))
  }

  /** Per-user behavioral-sequence NLL under the corpus's own event-type
    * bigram LM — the CCNet trick ([[graft.operators.LanguageModel]]
    * x45) transferred from tokens to event streams: users whose
    * transition sequences are IMPROBABLE under the population's own
    * transition statistics (high NLL) are behavioral anomalies —
    * replayed journeys, fraud scripts, broken clients — that per-cell
    * volume tests (x66) and gap-regularity (x97) can't see, because
    * each transition is individually common; the SEQUENCE is not.
    *
    * 100 TB shape: transitions come from ONE keyed lead window (x76's
    * shape); the LM tables are k²/k rows (k = type cardinality) and
    * BROADCAST back onto the transition frame; per-user scores are one
    * partial-agged groupBy. Add-alpha smoothing over the k-type
    * vocabulary; ln terms summed per user and rounded to 6 (the x45
    * precedent). Users with < 2 events have no transitions and are
    * absent. Output: (user, n_transitions, nll). */
  def sequenceNll(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, alpha: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("cur"), col(tsCol), col(tieCol))
      .withColumn("nxt", lead(col("cur"), 1).over(perUser))
      .filter(col("nxt").isNotNull)
      .select(col(userCol), col("cur"), col("nxt"))
    val c2 = pairs.groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("cur")).agg(sum(col("c2")).as("c1"))
    val v = events.select(col(typeCol)).distinct().count()
    pairs
      .join(broadcast(c2), Seq("cur", "nxt"))
      .join(broadcast(c1), Seq("cur"))
      .withColumn("lp", log((col("c2") + alpha) / (col("c1") + alpha * v)))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_transitions"), sum(col("lp")).as("ll"))
      .select(col(userCol), col("n_transitions"),
        round(-col("ll") / col("n_transitions"), 6).as("nll"))
  }

  /** Lifetime audience-overlap matrix between event types: for every
    * type pair, how many USERS did both, and the containment-style
    * overlap |A ∩ B| / min(|A|, |B|) — [[sessionRules]]' lifetime-
    * granularity sibling (rules ask "within one session"; this asks
    * "ever" — the audience view that sizes feature bundles and decides
    * which funnels are even worth defining).
    *
    * 100 TB shape: the event log reduces to DISTINCT (type, user) rows
    * first; the self-join is equi-keyed on the user with per-user
    * fan-out <= k² (k = type cardinality, tens); pair counts partial-agg
    * on the k² key space, sizes broadcast back. Output:
    * (type_a, type_b, n_a, n_b, n_both, overlap), a < b. */
  def audienceOverlap(events: DataFrame, userCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val ut = events.select(col(typeCol).as("t"), col(userCol).as("u"))
      .distinct()
    val sizes = ut.groupBy(col("t")).agg(count(lit(1)).as("n"))
    ut.toDF("type_a", "u")
      .join(ut.toDF("type_b", "u").hint("shuffle_hash"), Seq("u"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(sizes.toDF("type_a", "n_a")), Seq("type_a"))
      .join(broadcast(sizes.toDF("type_b", "n_b")), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        (col("n_both").cast(DoubleType) /
          least(col("n_a"), col("n_b")).cast(DoubleType)).as("overlap"))
  }

  /** Time-to-convert distribution: for each user, the delay from their
    * FIRST `startType` event to the earliest `convType` event strictly
    * after it, summarized as exact percentiles — the latency view the
    * funnel's depth count (x60) doesn't give: "how long does conversion
    * take", in exact integer microseconds until the final interpolation.
    *
    * 100 TB shape: two partial-agged groupBys (first start per user;
    * earliest qualifying conversion per user) joined shuffle_hash on the
    * user key; the percentile aggregate runs over one delta per CONVERTED
    * user (the x13-proven percentile/quantile_cont pair — swap in
    * Percentiles.exactSorted at extreme user counts). Output: one row
    * (n_converted, p<N>_us... doubles). */
  def timeToConvert(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, startType: String, convType: String,
      percents: Seq[Int] = Seq(25, 50, 75)): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "percents must be within [1, 100]")
    val starts = events.filter(col(typeCol) === startType)
      .groupBy(col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("v_us"))
    val deltas = events.filter(col(typeCol) === convType)
      .select(col(userCol), unix_micros(col(tsCol)).as("p_us"))
      .join(starts.hint("shuffle_hash"), Seq(userCol))
      .filter(col("p_us") > col("v_us"))
      .groupBy(col(userCol))
      .agg(min(col("p_us") - col("v_us")).as("delta_us"))
    val aggs = count(lit(1)).as("n_converted") +: percents.map(p =>
      expr(s"percentile(delta_us, ${p / 100.0})").as(s"p${p}_us"))
    deltas.agg(aggs.head, aggs.tail: _*)
  }

  /** Session-level association rules (support / confidence / lift) over
    * event types — market-basket mining with [[Temporal.sessionize]]d
    * sessions as the baskets: "sessions containing `ante` also contain
    * `cons`" with exact counts, the exploratory step before any funnel
    * definition exists (funnels test a HYPOTHESIZED sequence; rules
    * DISCOVER which type pairs co-occur beyond chance — lift > 1).
    *
    * 100 TB shape: sessionize's keyed window, then the corpus reduces to
    * DISTINCT (session, type) rows — bounded by sessions x type
    * cardinality, not events; the pair self-join is equi-keyed on the
    * session id (per-session fan-out = distinct-types², small by
    * definition of a session); counts partial-agg on the k² type-pair
    * key space. All three measures are divisions of exact BIGINTs; the
    * session total rides along as a broadcast 1-row frame. Both rule
    * orientations are emitted (confidence is asymmetric). Output:
    * (ante, cons, n_ab, n_a, n_b, support, confidence, lift). */
  def sessionRules(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, gapSeconds: Long,
      minPairCount: Long = 1L): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    require(gapSeconds >= 1L && minPairCount >= 1L,
      "gapSeconds and minPairCount must be >= 1")
    val items = Temporal.sessionize(
        events.select(col(userCol).as("u"), col(typeCol).as("t"),
          col(tsCol).as("ts"), col(tieCol).as("tie")),
        "u", "ts", "tie", gapSeconds)
      .select(col("u"), col("session_id").as("sid"), col("t"))
      .distinct()
    val nSessions = items.select(col("u"), col("sid")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val singles = items.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    val pairs = items.toDF("u", "sid", "ante")
      .join(items.toDF("u", "sid", "cons").hint("shuffle_hash"),
        Seq("u", "sid"))
      .filter(col("ante") =!= col("cons"))
      .groupBy(col("ante"), col("cons"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(broadcast(singles.toDF("ante", "n_a")), Seq("ante"))
      .join(broadcast(singles.toDF("cons", "n_b")), Seq("cons"))
      .crossJoin(broadcast(nSessions))
      .select(col("ante"), col("cons"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast(DoubleType) / col("n_sessions").cast(DoubleType))
          .as("support"),
        (col("n_ab").cast(DoubleType) / col("n_a").cast(DoubleType))
          .as("confidence"),
        ((col("n_ab") * col("n_sessions")).cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType)).as("lift"))
  }

  /** Inter-arrival regularity per user — the standard bot/scraper signal
    * over an event log: organic users emit bursty gaps (high coefficient
    * of variation), schedulers and scripts emit metronome gaps (CV near
    * 0). A curation pipeline runs this BEFORE funnels/retention so
    * automated traffic doesn't pollute product metrics, and over crawl
    * logs to drop machine-generated text sources.
    *
    * All arithmetic is INTEGER-EXACT (the x66 recipe): gaps are BIGINT
    * microseconds from a keyed lag window; CV^2 = var/mean^2 =
    * (n*SS - S^2)/S^2 over the per-user gap aggregates, so the flag
    * `n*SS - S^2 < S^2 / cvDenom` is evaluated as DECIMAL(38,0) products
    * `cvDenom * (n*SS - S^2) < S^2` — no float division, no borderline
    * ulp flips between engines. cvDenom = 100 flags CV < 0.1 (gaps
    * within ~10% of their mean — far more regular than human traffic).
    *
    * 100 TB shape: one keyed window (shuffle by user), then a
    * partial-agged groupBy(user) over the gap rows — no self-join, no
    * global sort, driver sees nothing. Users need >= minGaps gaps
    * (default 3) to be judged at all. Output: (user, n_gaps long,
    * sum_gap_us long, regular boolean). */
  def gapRegularity(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, minGaps: Int = 3, cvDenom: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minGaps >= 1 && cvDenom >= 1, "minGaps and cvDenom must be >= 1")
    // order on the exact micros projection (ts itself is projected away)
    val perUser = Window.partitionBy(col(userCol))
      .orderBy(col("us"), col(tieCol))
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val gaps = events
      .select(col(userCol), unix_micros(col(tsCol)).as("us"), col(tieCol))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(perUser))
      .filter(col("gap").isNotNull)
    gaps.groupBy(col(userCol))
      // gap^2 can pass 2^63 (a month-long gap squared is ~1e25), so the
      // squares accumulate in DECIMAL(38,0), not BIGINT
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sum_gap_us"),
        sum(col("gap").cast(d38) * col("gap").cast(d38)).as("ss"))
      .filter(col("n_gaps") >= minGaps)
      .withColumn("regular",
        lit(cvDenom.toLong).cast(d38) *
          (col("n_gaps").cast(d38) * col("ss").cast(d38) -
            col("sum_gap_us").cast(d38) * col("sum_gap_us").cast(d38)) <
          col("sum_gap_us").cast(d38) * col("sum_gap_us").cast(d38))
      .select(col(userCol), col("n_gaps"), col("sum_gap_us"), col("regular"))
  }

  /** CUPED variance reduction for an A/B readout (Deng, Xu, Kohavi &
    * Walker 2013): per user, the experiment-period metric y is adjusted by
    * the PRE-period covariate x — y_adj = y - theta * (x - mean(x)) with
    * theta = cov(x, y) / var(x) pooled over all users — which removes the
    * between-user variance x explains while leaving every arm's expected
    * lift unchanged. Arms are assigned by deterministic hash of the user
    * id (the engine's reproducible-split convention). Output: one row per
    * arm with user count, raw and adjusted means, raw and adjusted
    * population variances, and the variance-reduction ratio.
    *
    * 100 TB shape: one scan into a per-user partial-agged groupBy
    * (conditional sums for the two periods), one 1-row pooled-moments
    * aggregate broadcast back over the 2-row arm aggregate — no window, no
    * join that scales with events. Double sums follow the engine's
    * round-6-at-the-end convention (x45/x109).
    */
  def cupedAdjust(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, cutoff: String, arms: Int = 2): DataFrame = {
    require(arms >= 2, "need at least 2 arms")
    val d = (c: Column) => c.cast("double")
    val perUser = events.groupBy(col(userCol))
      .agg(
        sum(when(col(tsCol) < lit(cutoff).cast("timestamp"),
          col(valueCol)).otherwise(lit(0.0))).as("x"),
        sum(when(col(tsCol) >= lit(cutoff).cast("timestamp"),
          col(valueCol)).otherwise(lit(0.0))).as("y"))
      .withColumn("arm", pmod(graft.functions.TextFunctions.md5Long(
        col(userCol)), lit(arms.toLong)))
    val pooled = perUser.agg(count(lit(1)).as("n_all"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    // degenerate covariate (all x equal): pin theta to 0 — no adjustment
    // — rather than divide by zero (ANSI) / inf (non-ANSI); same CASE in
    // the oracle (the x172 MASE convention)
    val withTheta = perUser.crossJoin(broadcast(pooled))
      .withColumn("theta",
        when(d(col("n_all")) * col("sxx") - col("sx") * col("sx") === 0.0,
          lit(0.0)).otherwise(
          (d(col("n_all")) * col("sxy") - col("sx") * col("sy")) /
            (d(col("n_all")) * col("sxx") - col("sx") * col("sx"))))
      .withColumn("y_adj",
        col("y") - col("theta") * (col("x") - col("sx") / d(col("n_all"))))
    withTheta.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("y")).as("ssy"), sum(col("y") * col("y")).as("ssyy"),
        sum(col("y_adj")).as("ssa"), sum(col("y_adj") * col("y_adj")).as("ssaa"))
      .select(col("arm"), col("n_users"),
        round(col("ssy") / d(col("n_users")), 6).as("mean_y"),
        round(col("ssa") / d(col("n_users")), 6).as("mean_y_adj"),
        round((col("ssyy") - col("ssy") * col("ssy") / d(col("n_users"))) /
          d(col("n_users")), 6).as("var_y"),
        round((col("ssaa") - col("ssa") * col("ssa") / d(col("n_users"))) /
          d(col("n_users")), 6).as("var_y_adj"),
        // an arm with zero raw variance has nothing to reduce: NULL
        round(when(
          col("ssyy") - col("ssy") * col("ssy") / d(col("n_users")) === 0.0,
          lit(null).cast("double")).otherwise(lit(1.0) -
          ((col("ssaa") - col("ssa") * col("ssa") / d(col("n_users"))) /
           (col("ssyy") - col("ssy") * col("ssy") / d(col("n_users"))))), 6)
          .as("var_reduction"))
  }

  /** Two-covariate regression adjustment (the CUPAC/regression-
    * adjustment extension of [[cupedAdjust]]): y is residualized
    * against BOTH the pre-period value sum x1 and the pre-period event
    * count x2 by pooled OLS — the 2x2 normal equations in closed form
    * (b = (X'X)^-1 X'y on centered sums), so a covariate the single-
    * theta CUPED can't exploit (activity level vs spend level) still
    * buys variance. Collinear or constant covariates pin b1 = b2 = 0
    * (no adjustment — the cupedAdjust det-guard convention).
    *
    * Output per arm: (arm, n_users, mean_y, mean_y_adj, var_y,
    * var_y_adj, var_reduction, b1, b2) — the [[cupedAdjust]] readout
    * shape with the fitted coefficients alongside.
    *
    * 100 TB shape: identical to [[cupedAdjust]] — one per-user partial
    * agg, one 1-row pooled-moments reduce broadcast back, one per-arm
    * reduce. The 2x2 solve is scalar arithmetic in the projection.
    *
    * Determinism note (round-9 advice): the x1/y moment sums accumulate
    * as raw doubles, following the cupedAdjust precedent, so partition-
    * order float accumulation could in principle flip the 6th decimal
    * between runs/engines; it has stayed oracle-green at both gated
    * scales. If a flip ever appears at larger scale, quantize the value
    * sums to the 1e6 microgrid before aggregation (the x181 fold), as
    * the integer-exact operators do. */
  def regressionAdjust2(events: DataFrame, userCol: String,
      tsCol: String, valueCol: String, cutoff: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val pre = col(tsCol) < lit(cutoff).cast("timestamp")
    val perUser = events.groupBy(col(userCol))
      .agg(
        sum(when(pre, col(valueCol)).otherwise(lit(0.0))).as("x1"),
        d(sum(when(pre, 1L).otherwise(0L))).as("x2"),
        sum(when(!pre, col(valueCol)).otherwise(lit(0.0))).as("y"))
      .withColumn("arm", pmod(graft.functions.TextFunctions.md5Long(
        col(userCol)), lit(2L)))
    val pooled = perUser.agg(count(lit(1)).as("n_all"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"))
    val n = d(col("n_all"))
    val c11 = col("s11") - col("s1") * col("s1") / n
    val c12 = col("s12") - col("s1") * col("s2") / n
    val c22 = col("s22") - col("s2") * col("s2") / n
    val c1y = col("s1y") - col("s1") * col("sy") / n
    val c2y = col("s2y") - col("s2") * col("sy") / n
    val det = c11 * c22 - c12 * c12
    val withB = perUser.crossJoin(broadcast(pooled))
      .withColumn("b1", when(det === 0.0, lit(0.0))
        .otherwise((c22 * c1y - c12 * c2y) / det))
      .withColumn("b2", when(det === 0.0, lit(0.0))
        .otherwise((c11 * c2y - c12 * c1y) / det))
      .withColumn("y_adj", col("y")
        - col("b1") * (col("x1") - col("s1") / n)
        - col("b2") * (col("x2") - col("s2") / n))
    withB.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("y")).as("ssy"), sum(col("y") * col("y")).as("ssyy"),
        sum(col("y_adj")).as("ssa"),
        sum(col("y_adj") * col("y_adj")).as("ssaa"),
        min(col("b1")).as("b1v"), min(col("b2")).as("b2v"))
      .select(col("arm"), col("n_users"),
        round(col("ssy") / d(col("n_users")), 6).as("mean_y"),
        round(col("ssa") / d(col("n_users")), 6).as("mean_y_adj"),
        round((col("ssyy") - col("ssy") * col("ssy") / d(col("n_users"))) /
          d(col("n_users")), 6).as("var_y"),
        round((col("ssaa") - col("ssa") * col("ssa") / d(col("n_users"))) /
          d(col("n_users")), 6).as("var_y_adj"),
        round(when(
          col("ssyy") - col("ssy") * col("ssy") / d(col("n_users")) === 0.0,
          lit(null).cast("double")).otherwise(lit(1.0) -
          ((col("ssaa") - col("ssa") * col("ssa") / d(col("n_users"))) /
           (col("ssyy") - col("ssy") * col("ssy") / d(col("n_users"))))), 6)
          .as("var_reduction"),
        round(col("b1v"), 6).as("b1"), round(col("b2v"), 6).as("b2"))
      .orderBy(col("arm"))
  }

  /** Negative-binomial moment fit of per-user event counts — the
    * overdispersion model behind "a Poisson rate limit will misfire":
    * user activity is almost never Poisson (var = mean); the NB2
    * method-of-moments size r = mean^2/(var - mean) and p = mean/var
    * (Cameron & Trivedi 1998) quantify HOW bursty, and feed capacity
    * planning, bot thresholds, and the x229 burstiness readout with an
    * actual generative parameterization. var <= mean pins (r, p) NULL
    * — equi- or under-dispersed counts have no NB2 fit.
    *
    * Output one row: (n_users, mean, var, dispersion_index, r, p) —
    * moments from exact integer (count, sum, sum-of-squares).
    *
    * 100 TB shape: one per-user partial agg, one 1-row moment reduce. */
  def negBinFit(events: DataFrame, userCol: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val perUser = events.groupBy(col(userCol))
      .agg(count(lit(1)).as("c"))
    val g = perUser.agg(count(lit(1)).as("n"),
      sum(col("c")).as("s"),
      sum(col("c").cast(dec) * col("c").cast(dec)).as("s2"))
    val s2D = col("s2").cast("string").cast("double")
    val mean = d(col("s")) / d(col("n"))
    val variance = s2D / d(col("n")) - mean * mean
    g.select(col("n").as("n_users"),
      round(mean, 6).as("mean"),
      round(variance, 6).as("var"),
      round(when(mean === 0.0, lit(null).cast("double"))
        .otherwise(variance / mean), 6).as("dispersion_index"),
      round(when(variance <= mean, lit(null).cast("double"))
        .otherwise(mean * mean / (variance - mean)), 6).as("r"),
      round(when(variance <= mean, lit(null).cast("double"))
        .otherwise(mean / variance), 6).as("p"))
  }
}
