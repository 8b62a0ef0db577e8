package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

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

  /** Burst collapse (trailing debounce): keep only the FIRST event of
    * each per-(key, type) burst, where a burst is a chain of events with
    * consecutive gaps <= `withinSeconds` — the double-click / retry /
    * duplicate-beacon hygiene filter an event pipeline runs before any
    * counting (a stuck client emitting 50 clicks in 3 seconds is one
    * click). Exactly [[sessionize]]'s is-new rule on the (key, type)
    * composite: an event survives iff no SAME-typed event from the same
    * key precedes it within the window — so an hour-long burst still
    * collapses to ONE event (the lag test resets on every raw event,
    * kept or not).
    *
    * One keyed lag window (shuffle on (key, type)), exact integer micros,
    * original columns preserved. */
  def debounce(df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      tieCol: String, withinSeconds: Long): DataFrame = {
    require(withinSeconds >= 1L, "withinSeconds must be >= 1")
    val w = Window.partitionBy(col(keyCol), col(typeCol))
      .orderBy(col("__us"), col(tieCol))
    df.withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .filter(col("__prev").isNull ||
        col("__us") - col("__prev") > withinSeconds * 1000000L)
      .drop("__us", "__prev")
  }

  /** Session-level feature table: one row per [[sessionize]]d session with
    * the features every engagement/bot/conversion model starts from —
    * event count, exact start/end/duration in integer microseconds, and
    * the session's value total (exact DecimalType internally, re-typed
    * double-via-string per the engine convention). The event-level
    * session labels stay joinable (same keyCol + session_id).
    *
    * Scale shape: sessionize's keyed windows (one shuffle on the key),
    * then ONE partial-agged groupBy(key, session) — already co-partitioned
    * by the window shuffle, so no second corpus shuffle. Output:
    * (key, session_id, n_events, start_us, end_us, duration_us,
    * sum_value). */
  def sessionFeatures(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long, valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    sessionize(df, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        sum(col(valueCol).cast(dec)).as("__sv"))
      .select(col(keyCol), col("session_id"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"),
        col("__sv").cast("string").cast("double").as("sum_value"))
  }

  /** Time-series resample with gap fill and forward fill: bucket events
    * into fixed `bucketSeconds` windows per key, then materialize EVERY
    * bucket in the observed global range for every key — absent buckets
    * get n=0 / null sum — and carry the last observed sum forward
    * (`filled_value`). The resample-then-gap-fill shape every monitoring
    * and training-telemetry pipeline needs before charting, anomaly
    * scoring, or windowed models: downstream ops can assume a dense,
    * aligned per-key series.
    *
    * Scale shape:
    *  - The only corpus-sized operation is the first partial-agged
    *    groupBy(key, bucket); everything after runs on the REDUCED frame
    *    (|keys| x |buckets| rows).
    *  - The scaffold is generated, not stored: distinct keys cross-joined
    *    with a 1-row global [min,max] bucket frame, then one
    *    `sequence(...)` explode — a narrow Generate, no driver collect
    *    (the range never materializes on the driver).
    *  - Gap fill is a left join equi-keyed on (key, bucket); forward
    *    fill is a keyed running `last(ignoreNulls)` window — one shuffle
    *    each, both on the reduced frame.
    *  - Bucket arithmetic is exact integer micros (`unix_micros` +
    *    IntegralDivide `div`; DuckDB `epoch_us(...) // ...`) — no
    *    double rounding at bucket edges.
    *
    * Sums are exact DecimalType(18,6) internally; output re-types them
    * double-via-string per the engine's exactness convention. Output:
    * (key, bucket_start timestamp, n long, sum_value, filled_value).
    */
  def resampleGapFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    val step = bucketSeconds * 1000000L
    val bucketed = df.select(col(keyCol), col(valueCol),
      expr(s"unix_micros(`$tsCol`) div ${step}L").as("__b"))
    val obs = bucketed.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .as("__sv"))
    // generated scaffold: |keys| x [min..max] buckets, no driver collect
    val range = obs.agg(min(col("__b")).as("__mn"), max(col("__b")).as("__mx"))
    val scaffold = obs.select(col(keyCol)).distinct()
      .crossJoin(range)
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"))).as("__b"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold.join(obs, Seq(keyCol, "__b"), "left")
      .withColumn("__ff", last(col("__sv"), ignoreNulls = true).over(w))
      .select(col(keyCol),
        timestamp_micros(col("__b") * step).as("bucket_start"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("__sv").cast(StringType).cast(DoubleType).as("sum_value"),
        col("__ff").cast(StringType).cast(DoubleType).as("filled_value"))
  }

  /** Per-key exponentially-weighted moving average over event time — the
    * anomaly-baseline / trend-smoothing primitive: w_1 = x_1,
    * w_t = (1-alpha)*w_{t-1} + alpha*x_t in (ts, tie) order, final w_n
    * per key.
    *
    * The recurrence is ORDER-CANONICAL by construction: one
    * partial-agged collect_list shuffle per key (the funnel shape), the
    * sorted fold runs the identical 2-mult-1-add step sequence on any
    * engine, so the double result is reproducible — unlike the closed
    * form sum(x_i*(1-a)^(n-i)), whose distributed summation order is
    * not. State O(1), per-key cost O(own events). Output: (key, n_events
    * long, ewma double rounded to 6).
    */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val ev = struct(unix_micros(col(tsCol)).as("ts"), col(tieCol).as("tie"),
      col(valueCol).cast(DoubleType).as("value"))
    events.select(col(keyCol), ev.as("__e"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(col(keyCol),
        size(col("__evs")).cast("long").as("n_events"),
        round(aggregate(
          slice(transform(col("__evs"), e => e("value")), lit(2),
            size(col("__evs"))),
          element_at(transform(col("__evs"), e => e("value")), 1),
          (acc, x) => acc * lit(1.0 - alpha) + lit(alpha) * x), 6).as("ewma"))
  }

  /** Offline CUSUM changepoint per key: where does each key's daily
    * volume most sharply shift level? For the observed buckets of a key
    * (ordered, gaps ignored), the classic offline CUSUM statistic is
    * S_t = sum_{i<=t}(n_i - mean); the changepoint estimate is the
    * bucket maximizing |S_t|. To keep both engines bit-identical the
    * statistic is computed SCALED BY D (the key's bucket count):
    * D*S_t = D*C_t - t*T with C_t the running count sum and T the key
    * total — pure int64 arithmetic, no double drift in the running sum
    * (a windowed double cumsum is engine-order-sensitive; this isn't).
    *
    * Scale shape: one (key, bucket) count agg (partial-agged), one
    * PER-KEY window for (t, C_t) — never a global sort — and one
    * max-struct agg per key. Buckets per key are calendar-bounded, so
    * per-key state stays O(days) at any corpus size. Ties on |S| break
    * to the EARLIEST bucket via max(struct(s_abs, -bucket)). Output:
    * (key, cp_bucket_us long, s_abs_scaled long, n_buckets long).
    */
  def cusumChangepoint(events: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val busc = bucketSeconds * 1000000L
    val daily = events
      .select(col(keyCol).as("__k"),
        call_function("div", unix_micros(col(tsCol)), lit(busc)).as("__bk"))
      .groupBy(col("__k"), col("__bk")).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__bk"))
    val cum = daily
      .withColumn("__t", row_number().over(w).cast("long"))
      .withColumn("__c", sum(col("__n")).over(w))
    cum.groupBy(col("__k"))
      .agg(max(col("__t")).as("n_buckets"),
        max(col("__c")).as("__tot"),
        collect_list(struct(col("__bk"), col("__t"), col("__c"))).as("__rows"))
      .select(col("__k").as(keyCol), col("n_buckets"), col("__tot"),
        aggregate(col("__rows"),
          struct(lit(-1L).as("sa"), lit(0L).as("nbk")),
          (acc, r) => {
            val sa = abs(col("n_buckets") * r("__c") - r("__t") * col("__tot"))
            when(sa > acc("sa") ||
                (sa === acc("sa") && -r("__bk") > acc("nbk")),
              struct(sa.as("sa"), (-r("__bk")).as("nbk"))).otherwise(acc)
          }).as("__m"))
      .select(col(keyCol),
        ((-col("__m.nbk")) * busc).as("cp_bucket_us"),
        col("__m.sa").as("s_abs_scaled"),
        col("n_buckets").cast("long").as("n_buckets"))
  }

  /** Theil–Sen robust trend per key: the median of all pairwise slopes
    * (n_j - n_i)/(bk_j - bk_i) over the key's daily counts — the
    * breakdown-50% alternative to the OLS slope that one outlier day
    * can swing arbitrarily ([[graft.operators.CorpusOps.zipfSlope]] is
    * the OLS form). "Median" is pinned to the ceil(m/2)-th SMALLEST
    * slope (lower median) — a selection, not an interpolation, so both
    * engines agree bit-for-bit on duplicated slope values.
    *
    * Scale shape: the pair frame is a PER-KEY self-join of daily
    * aggregates — m <= days(days-1)/2 pairs per key, calendar-bounded
    * regardless of row count (366 days -> <67k pairs/key), so the
    * quadratic is in the bounded dimension, never in corpus size. One
    * count agg, one shuffle_hash self-join on the key, one sorted-fold
    * agg. Output: (key, n_pairs long, slope double rounded 6).
    */
  def theilSenSlope(events: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val busc = bucketSeconds * 1000000L
    val daily = events
      .select(col(keyCol).as("__k"),
        call_function("div", unix_micros(col(tsCol)), lit(busc)).as("__bk"))
      .groupBy(col("__k"), col("__bk")).agg(count(lit(1)).as("__n"))
    val a = daily.select(col("__k"), col("__bk").as("__b1"), col("__n").as("__n1"))
    val b = daily.select(col("__k"), col("__bk").as("__b2"), col("__n").as("__n2"))
    a.join(b.hint("shuffle_hash"), Seq("__k"))
      .filter(col("__b1") < col("__b2"))
      .select(col("__k"),
        ((col("__n2") - col("__n1")).cast(DoubleType) /
          (col("__b2") - col("__b1")).cast(DoubleType)).as("__s"))
      .groupBy(col("__k"))
      .agg(sort_array(collect_list(col("__s"))).as("__ss"))
      .select(col("__k").as(keyCol),
        size(col("__ss")).cast("long").as("n_pairs"),
        round(element_at(col("__ss"),
          ((size(col("__ss")) + 1) / 2).cast("int")), 6).as("slope"))
  }

  /** Holt double-exponential smoothing per key over bucketed value sums
    * — level + trend where [[ewma]] is level-only, giving a one-step
    * forecast that tracks drifting volume. Recurrence (l_1 = x_1,
    * b_1 = 0): l_t = alpha*x_t + (1-alpha)*(l_{t-1}+b_{t-1});
    * b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}.
    *
    * Same order-canonical design as [[ewma]]: bucket sums are exact
    * DecimalType(18,6) (re-typed double via string), the per-key series
    * is sorted once and folded with a struct accumulator — the identical
    * double op sequence on any engine, unlike any closed form. State
    * O(1) per key, series length calendar-bounded. Output: (key,
    * n_buckets long, level, trend, forecast_1 double rounded 6).
    */
  def holtLinear(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long,
      alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(beta >= 0 && beta <= 1, "beta must be in [0, 1]")
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val busc = bucketSeconds * 1000000L
    val daily = events
      .select(col(keyCol).as("__k"),
        call_function("div", unix_micros(col(tsCol)), lit(busc)).as("__bk"),
        col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 6))
          .as("__v"))
      .groupBy(col("__k"), col("__bk"))
      .agg(sum(col("__v")).cast(StringType).cast(DoubleType).as("__x"))
    val step: (Column, Column) => Column = (acc, x) => {
      val lNew = lit(alpha) * x + lit(1.0 - alpha) * (acc("l") + acc("b"))
      struct(lNew.as("l"),
        (lit(beta) * (lNew - acc("l")) + lit(1.0 - beta) * acc("b")).as("b"))
    }
    daily.groupBy(col("__k"))
      .agg(sort_array(collect_list(struct(col("__bk"), col("__x")))).as("__sv"))
      .select(col("__k"), transform(col("__sv"), e => e("__x")).as("__xs"))
      .select(col("__k"),
        size(col("__xs")).cast("long").as("n_buckets"),
        aggregate(slice(col("__xs"), lit(2), size(col("__xs"))),
          struct(element_at(col("__xs"), 1).as("l"), lit(0.0).as("b")),
          step).as("__h"))
      .select(col("__k").as(keyCol), col("n_buckets"),
        round(col("__h.l"), 6).as("level"),
        round(col("__h.b"), 6).as("trend"),
        round(col("__h.l") + col("__h.b"), 6).as("forecast_1"))
  }

  /** Seasonal-naive forecast backtest per key: how much better does the
    * season-m naive forecast (x_t := x_{t-m}) do than the plain naive
    * (x_t := x_{t-1})? MASE-style ratio over the key's bucketed value
    * sums; mase < 1 means the series has real seasonal structure at
    * period m (for daily buckets, m=7 tests weekly shape) — the
    * sanity gate to run BEFORE shipping any seasonal model.
    *
    * Strictly calendar-aligned: errors join bucket bk to bk-1 / bk-m by
    * VALUE (missing days produce no pair), not by row offset, so gaps
    * never misalign the season. Sums are exact decimal; |diffs| stay
    * decimal and only the final mean divides in double. Two
    * shuffle_hash self-joins of the per-key daily aggregate — pair
    * count <= days per key, calendar-bounded. Output: (key, n1 long,
    * mae1, n_s long, mae_s, mase double rounded 6).
    */
  def seasonalNaiveBacktest(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long, season: Int): DataFrame = {
    require(season >= 2, "season must be >= 2")
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val busc = bucketSeconds * 1000000L
    val daily = events
      .select(col(keyCol).as("__k"),
        call_function("div", unix_micros(col(tsCol)), lit(busc)).as("__bk"),
        col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 6))
          .as("__v"))
      .groupBy(col("__k"), col("__bk")).agg(sum(col("__v")).as("__x"))
    def maeAtLag(lag: Int, nName: String, maeName: String): DataFrame = {
      val cur = daily.select(col("__k"), col("__bk"), col("__x"))
      val prev = daily.select(col("__k"), (col("__bk") + lag).as("__bk"),
        col("__x").as("__xp"))
      cur.join(prev.hint("shuffle_hash"), Seq("__k", "__bk"))
        .groupBy(col("__k"))
        .agg(count(lit(1)).as(nName),
          (sum(abs(col("__x") - col("__xp"))).cast(StringType)
            .cast(DoubleType) / count(lit(1)).cast(DoubleType)).as(maeName))
    }
    maeAtLag(1, "n1", "__mae1")
      .join(maeAtLag(season, "n_s", "__maeS").hint("shuffle_hash"),
        Seq("__k"))
      .select(col("__k").as(keyCol), col("n1"),
        round(col("__mae1"), 6).as("mae1"),
        col("n_s"), round(col("__maeS"), 6).as("mae_s"),
        // mae1 = 0 (constant consecutive values) pins mase to NULL on
        // both engines: Spark's non-ANSI divide yields NULL here while
        // DuckDB double division can yield inf/nan, so the oracle uses
        // nullif(mae1, 0) to agree
        round(when(col("__mae1") =!= 0.0,
          col("__maeS") / col("__mae1")), 6).as("mase"))
  }

  /** Unnormalized Haar multiresolution decomposition of the daily
    * volume series over the first `days` (a power of two) days: detail
    * coefficients at every dyadic scale plus the total — the
    * multi-scale anomaly LOCALIZER next to the point detectors
    * ([[graft.operators.EventAnalytics]]'s EWMA/CUSUM): a one-day spike
    * lights up one fine coefficient, a week-scale shift lights up a
    * coarse one, and which (level, idx) fired says where and how wide.
    * Levels: 1 = finest detail (days/2 coefficients, idx = pair
    * position), up to log2(days) = coarsest detail (1), and
    * log2(days)+1 = the approximation (total count). All coefficients
    * are exact integer sums/differences of daily counts (left − right
    * per pair), bit-identical across engines. The frame is `days`
    * rows after one partial-agged scan; the level fold is log2(days)
    * bounded groupBys. Output: (level, idx, coef). */
  def haarVolume(events: DataFrame, tsCol: String,
      days: Int = 16): DataFrame = {
    require(days >= 2 && (days & (days - 1)) == 0,
      s"days must be a power of two >= 2: $days")
    val spark = events.sparkSession
    val levels = java.lang.Integer.numberOfTrailingZeros(days)
    val mind = events.agg(min(to_date(col(tsCol))).as("d0"))
    val byDay = events.select(to_date(col(tsCol)).as("dd"))
      .crossJoin(broadcast(mind))
      .select(datediff(col("dd"), col("d0")).cast("long").as("idx"))
      .filter(col("idx") < days.toLong)
      .groupBy(col("idx")).agg(count(lit(1)).as("c"))
    val spine = spark.range(days.toLong).select(col("id").as("idx"))
    var cur = spine.join(byDay, Seq("idx"), "left")
      .select(col("idx"), coalesce(col("c"), lit(0L)).as("c"))
    val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (lvl <- 1 to levels) {
      val paired = cur.groupBy(
          call_function("div", col("idx"), lit(2L)).as("idx"))
        .agg(sum(when(pmod(col("idx"), lit(2L)) === 0L, col("c"))
          .otherwise(-col("c"))).as("det"), sum(col("c")).as("s"))
      out += paired.select(lit(lvl.toLong).as("level"), col("idx"),
        col("det").as("coef"))
      cur = paired.select(col("idx"), col("s").as("c"))
    }
    out += cur.select(lit((levels + 1).toLong).as("level"),
      col("idx"), col("c").as("coef"))
    out.reduce(_ unionAll _).orderBy(col("level"), col("idx"))
  }

  /** Staircase half-life freshness weighting: each event's weight halves
    * every `halfLifeDays` FULL half-lives of age (weight_micro =
    * 1e6 >> floor(age/halfLife), exact integer — no transcendental
    * decay, so both engines sum identical longs). Per key:
    * effective (decayed) volume and the freshness ratio eff/n — the
    * recency-weighting readout behind "how much of this stream is
    * actually recent" mixture decisions, where a raw count treats a
    * year-old burst and yesterday's traffic as equal evidence.
    * Reference day = the stream's max event date (broadcast 1-row).
    * Shifts cap at 30 half-lives (weight 0 on the micro grid well
    * before that).
    *
    * Output per key: (key, n_events, eff_volume, freshness).
    *
    * 100 TB shape: one narrow scan + cross vs the broadcast 1-row max
    * + one partial-agged groupBy(key). */
  def decayedVolume(events: DataFrame, tsCol: String, keyCol: String,
      halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, "halfLifeDays must be >= 1")
    val d = (c: Column) => c.cast(DoubleType)
    val ref = events.agg(max(to_date(col(tsCol))).as("ref"))
    events.select(col(keyCol).as("g"), to_date(col(tsCol)).as("dday"))
      .crossJoin(broadcast(ref))
      .withColumn("steps",
        least(call_function("div",
          datediff(col("ref"), col("dday")).cast("long"),
          lit(halfLifeDays.toLong)), lit(30L)))
      .withColumn("wm", call_function("div", lit(1000000L),
        expr("shiftleft(1L, cast(steps as int))")))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_events"), sum(col("wm")).as("swm"))
      .select(col("g").as(keyCol), col("n_events"),
        round(d(col("swm")) / lit(1e6), 6).as("eff_volume"),
        round(d(col("swm")) / d(col("n_events")) / lit(1e6), 6)
          .as("freshness"))
      .orderBy(col(keyCol))
  }

  /** Retention/TTL audit: per key, how many rows are PAST the
    * retention window (age > ttlDays from the stream's max event
    * date) and how many exact payload bytes a compliance purge would
    * reclaim — the scheduled-deletion pre-flight every governed event
    * store runs before the actual delete job (and the number the
    * [[graft.operators.Scale.broadcastAdvisor]]-style planners want
    * NET of expired mass). Byte estimate = payload octet lengths
    * (the x261 width convention) so the reclaim figure is exact, not
    * sampled.
    *
    * Output per key: (key, n_rows, n_expired, expired_share,
    * reclaim_bytes).
    *
    * 100 TB shape: one narrow scan + broadcast 1-row max date + one
    * partial-agged groupBy(key). */
  def ttlAudit(events: DataFrame, tsCol: String, keyCol: String,
      payloadCols: Seq[String], ttlDays: Int): DataFrame = {
    require(ttlDays >= 1, "ttlDays must be >= 1")
    val d = (c: Column) => c.cast(DoubleType)
    val ref = events.agg(max(to_date(col(tsCol))).as("ref"))
    val rowBytes = payloadCols
      .map(c => coalesce(octet_length(col(c)), lit(0L)).cast("long"))
      .reduceOption(_ + _).getOrElse(lit(0L))
    events.select(col(keyCol).as("g"), to_date(col(tsCol)).as("dday"),
        rowBytes.as("bytes"))
      .crossJoin(broadcast(ref))
      .withColumn("expired",
        datediff(col("ref"), col("dday")) > ttlDays)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("expired"), 1L).otherwise(0L)).as("n_expired"),
        sum(when(col("expired"), col("bytes")).otherwise(0L))
          .as("reclaim_bytes"))
      .select(col("g").as(keyCol), col("n_rows"), col("n_expired"),
        round(d(col("n_expired")) / d(col("n_rows")), 6)
          .as("expired_share"),
        col("reclaim_bytes"))
      .orderBy(col(keyCol))
  }
}
