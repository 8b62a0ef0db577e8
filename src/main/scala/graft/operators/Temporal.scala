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
}
