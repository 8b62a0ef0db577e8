package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table shape (event_id, ts, user_id,
  * event_type, value, props).
  *
  * The batch twin of [[windowedCounts]] is SparkEntry's `st1_window_agg` —
  * same plan shape, so a pipeline step written against the batch form runs
  * unchanged as a stream (the Phase/Step algebra never collects or
  * globally sorts, by design).
  */
object EventStreams {

  /** The events schema as read from a stream source, parameterized on the
    * physical `ts` type the files actually use (the driver's generator has
    * shipped both INT64 nanos and TIMESTAMP_MICROS NTZ — see
    * [[graft.Tables.normalizeEventTs]]). */
  def rawSchema(tsType: DataType = TimestampNTZType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream source over a directory of events parquet.
    * Structured Streaming needs the schema up front, so sniff it once with
    * a batch read of whatever files are already in the dir (file-stream
    * sources always start from a staged directory here), then normalize
    * `ts` to session-TZ TimestampType exactly like the batch loader.
    */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case _: Exception => TimestampNTZType }
    val reader = spark.readStream.schema(rawSchema(tsType))
    // staged replays (watermark-advance tests, backfill rehearsals) need
    // files to arrive as separate micro-batches, not one AvailableNow gulp
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val raw = reader.parquet(dir)
    graft.Tables.normalizeEventTs(raw)
  }

  /** Tumbling-window counts + sums with a watermark for state eviction.
    * At scale: state is keyed (window, event_type) — bounded by the
    * watermark horizon, no unbounded state growth. */
  def windowedCounts(events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sessionization with session_window (gap-based), the other canonical
    * streaming state shape. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup on event ids: duplicates arriving within the
    * watermark horizon are dropped, and per-key state is evicted once the
    * watermark passes — bounded state, the streaming-ingest half of the
    * Dedup family. */
  def dedupStream(events: DataFrame, idCols: Seq[String] = Seq("event_id"),
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Explicit per-key state carried across micro-batches. */
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  final case class FunnelState(user_id: Long, steps_completed: Long,
    first_us: Option[Long], last_us: Option[Long])

  /** Custom keyed state via flatMapGroupsWithState — the escape hatch for
    * stateful logic that windows/session_window can't express (running
    * aggregates, CEP-ish per-key machines). Emits the updated per-user
    * running (count, total) on every micro-batch that touches the user.
    *
    * At scale: state is one small struct per user key, partitioned by the
    * state-store hash — no per-event growth. Production variants would add
    * a GroupStateTimeout (event-time with a watermark) to evict idle keys;
    * NoTimeout keeps the example deterministic. */
  def runningUserTotals(events: DataFrame): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = UserRunning(user, n, total)
          state.update(next)
          Iterator(next)
      }
  }

  /** Streaming strict-order funnel — the incremental twin of
    * [[graft.operators.EventAnalytics.funnel]]. State per user is the
    * walk itself: (depth, first_us, last_us), O(1) regardless of event
    * volume. Each micro-batch folds its group's step-type events in
    * event-time order through the same greedy walk as the batch operator.
    *
    * Ordering contract: the walk is exact when events arrive in event-time
    * order ACROSS micro-batches (per-batch disorder is repaired by the
    * in-batch sort). An event older than the last accepted step cannot
    * retroactively improve the walk and is skipped — the standard
    * late-data posture for streaming funnels; feed near-ordered logs (or
    * a watermark-sorted upstream) for exact parity with the batch
    * operator, which ExtensionOpsSpec gates.
    *
    * At scale: state is one small struct per user in the state store; no
    * per-event state growth (contrast the attribution join, which must
    * buffer events for its time range). NoTimeout keeps the example
    * deterministic; production would evict via event-time timeout once a
    * user's walk can no longer advance. */
  def funnelStream(events: DataFrame, steps: Seq[String]): Dataset[FunnelState] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    events.select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)]
      .filter(r => stepIdx.contains(r._2))
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelState](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long)],
            state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(user, 0L, None, None))
          // same acceptance rule as the batch fold: next step, strictly
          // after the last accepted timestamp
          for ((_, tpe, ts) <- rows.toSeq.sortBy(r => (r._3, stepIdx(r._2))))
            if (stepIdx(tpe) == st.steps_completed + 1 &&
                (st.steps_completed == 0 || ts > st.last_us.get))
              st = FunnelState(user, st.steps_completed + 1,
                if (st.steps_completed == 0) Some(ts) else st.first_us, Some(ts))
          state.update(st)
          Iterator(st)
      }
  }

  /** Streaming burst collapse — [[graft.operators.Temporal.debounce]]'s
    * online twin: per (user, type) key, an event is emitted iff the gap
    * since the key's previous RAW event exceeds `withinSeconds` — the
    * identical lag rule, so the emitted ids match the batch operator on
    * the same (near-ordered) stream, which the spec gates. State is ONE
    * timestamp per (user, type) forever — the smallest possible debounce
    * state (dropDuplicates-based dedup would key state by event identity
    * and grow unboundedly). Same ordered-arrival contract as
    * [[funnelStream]]; production evicts idle keys via event-time
    * timeout. Output: the surviving (user_id, event_type, event_id,
    * ts_us) rows. */
  def debounceStream(events: DataFrame,
      withinSeconds: Long): Dataset[(Long, String, Long, Long)] = {
    require(withinSeconds >= 1L, "withinSeconds must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val winUs = withinSeconds * 1000000L
    events.select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Long, (Long, String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String, Long, Long)],
            state: GroupState[Long]) =>
          var last = state.getOption.getOrElse(Long.MinValue)
          val kept = rows.toSeq.sortBy(r => (r._4, r._3)).flatMap { r =>
            val keep = last == Long.MinValue || r._4 - last > winUs
            last = r._4 // the lag rule resets on every RAW event
            if (keep) Some(r) else None
          }
          state.update(last)
          kept.iterator
      }
  }

  /** Stream-static enrichment join: each micro-batch of events joins a
    * static dimension frame (the streaming twin of J1's lookup join). The
    * static side is broadcast when small — no stream-side shuffle, no
    * state store involvement (stream-static joins are stateless; only
    * stream-stream joins buffer). At 100 TB/day the static side is the
    * bounded one by construction, so this stays a map-side join. */
  def enrichStream(events: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String): DataFrame =
    events.join(broadcast(dim), col(streamKey) === col(dimKey), "left")

  /** Stream-STREAM attribution join: each left event (e.g. a click) pairs
    * with the right events (e.g. views) of the SAME user whose timestamp
    * falls in [left.ts, left.ts + maxDelay) — the canonical two-stream
    * funnel/attribution shape, and the one streaming join that buffers
    * state on both sides.
    *
    * At scale the two constraints that keep state bounded are encoded
    * here, not left to the caller: BOTH sides carry a watermark, and the
    * join condition includes the event-time RANGE (Spark derives each
    * side's state-eviction horizon from exactly that pair — an equi-only
    * condition would buffer the streams forever). State is keyed on
    * user_id, so it shuffles once per side and never concentrates beyond
    * the hottest user's horizon window.
    *
    * The batch twin is SparkEntry's `st4_attribution_join` (same
    * predicate as a plain join), oracle-replayed in SQL.
    */
  def attributionJoinStream(left: DataFrame, right: DataFrame,
      maxDelay: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.select(col("event_id").as("l_event_id"),
        col("user_id").as("l_user_id"), col("ts").as("l_ts"))
      .withWatermark("l_ts", watermarkDelay)
    val r = right.select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("r_ts"))
      .withWatermark("r_ts", watermarkDelay)
    l.join(r,
      col("l_user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") < col("l_ts") + expr(s"interval $maxDelay"))
      .select(col("l_user_id").as("user_id"),
        col("l_event_id"), col("r_event_id"), col("l_ts"), col("r_ts"))
  }

  /** Drive a streaming frame synchronously into an in-memory table (test /
    * smoke harness; production would use a real sink + trigger). */
  def runToMemory(df: DataFrame, queryName: String,
      outputMode: String = "append"): StreamingQuery = {
    val q: DataStreamWriter[org.apache.spark.sql.Row] = df.writeStream
      .format("memory").queryName(queryName).outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
    val sq = q.start()
    sq.processAllAvailable()
    sq
  }

  /** Streaming distinct-count per group WITHOUT identity state: the HLL
    * register cells (Profile.hllRegisters — (group, j, max rho)) ARE the
    * streaming aggregation, so Spark's state store holds at most
    * 256 rows per group no matter how many distinct values flow past —
    * the alternative, `dropDuplicates` + count, keys state by VALUE and
    * grows without bound (watermarks can't save a distinct-count whose
    * horizon is "forever"). Each trigger folds the current registers to
    * per-group estimates (Profile.hllEstimate) and hands them to
    * `writeBatch`; because register max is commutative and the hash is
    * md5-deterministic, the estimate after N micro-batches is IDENTICAL
    * to the batch hllDistinct over the union of all batches — the spec
    * gates exactly that.
    */
  def hllDistinctStream(events: DataFrame, groupCol: String, valueCol: String)(
      writeBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val cells = graft.operators.Profile.hllRegisters(events, groupCol, valueCol)
    val q = cells.writeStream
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(
          graft.operators.Profile.hllEstimate(batch, groupCol), batchId)
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming count-min frequencies — [[hllDistinctStream]]'s sibling for
    * "how often", not "how many distinct": the sketch cells
    * (FrequentItems.countMinCells — (row, bucket, n)) ARE the streaming
    * aggregation, so the state store holds at most depth x width rows
    * forever, where a per-item groupBy count keys state by ITEM and grows
    * with the vocabulary (watermarks can't bound an all-time frequency).
    * Counts sum commutatively and the hash rows are md5-deterministic, so
    * after N micro-batches the cells — and every point estimate derived
    * from them — are IDENTICAL to the batch sketch over the batches'
    * union (the spec gates that). Each trigger hands the current cells
    * to `writeBatch`; query them with FrequentItems.countMinEstimate. */
  def countMinStream(events: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 512)(
      writeBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val cells = graft.operators.FrequentItems.countMinCells(
      events, itemCol, depth, width)
    val q = cells.writeStream
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId)
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming hour-of-week seasonal profile — the live twin of x135's
    * [[graft.operators.EventAnalytics.hourOfWeekProfile]], and it IS that
    * operator applied to a streaming frame: the declarative groupBy's
    * state is the (dow, hour) cells, bounded at 168 rows FOREVER, so no
    * watermark is needed — the cheapest possible always-on traffic
    * monitor (complete output mode; each trigger re-emits the whole
    * 168-row profile). Commutative counts ⇒ after any number of
    * micro-batches the profile equals the batch op over the batches'
    * union (spec-gated). */
  def hourOfWeekStream(events: DataFrame): DataFrame =
    graft.operators.EventAnalytics.hourOfWeekProfile(events, "ts")

  /** Streaming out-of-orderness monitor — the live twin of x150's
    * [[graft.operators.EventAnalytics.outOfOrderness]], measuring the
    * event-time regression tail that SIZES every other stream's
    * watermark (this monitor itself must not drop late data, so it keys
    * state by user with no event-time horizon). State per user is ONE
    * (last event-time) pair — the same minimal-state shape as
    * [[debounceStream]], and the same ordered-arrival contract: within a
    * micro-batch rows are replayed in `event_id` (ingestion-sequence)
    * order, across batches in arrival order, matching the batch
    * operator's seq-ordered lag exactly when ingestion order is
    * batch-monotone (spec-gated on the file replay). Emits one
    * (user_id, n_pairs, n_inversions, max_regression_us) DELTA row per
    * user per micro-batch; the dashboard (or the spec) sums pairs and
    * inversions and maxes the regression — all commutative, so the
    * rolled-up totals equal the batch report over the batches' union.
    * Production evicts idle users via event-time timeout. */
  def outOfOrdernessStream(events: DataFrame)
      : Dataset[(Long, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long)],
            state: GroupState[Long]) =>
          var pairs = 0L; var inv = 0L; var maxReg = 0L
          var last = state.getOption.getOrElse(Long.MinValue)
          rows.toSeq.sortBy(_._2).foreach { r =>
            if (last != Long.MinValue) {
              pairs += 1L
              if (r._3 < last) { inv += 1L; maxReg = maxReg.max(last - r._3) }
            }
            last = r._3
          }
          state.update(last)
          if (pairs > 0L) Iterator((user, pairs, inv, maxReg)) else Iterator.empty
      }
  }

  /** Streaming per-bucket churn monitor — the live twin of x132's
    * [[graft.operators.EventAnalytics.churn]]. State per user is ONE
    * long (the last active bucket). Two emission paths cover the two
    * ways a bucket-(b+1) row arises: (data) when a user reappears in
    * bucket b' > b, emit the transition row for bucket b+1 — prev-active
    * 1, churned 1 iff b' > b+1; (timeout) when the WATERMARK passes the
    * end of bucket b+1 without the user returning, the event-time
    * timeout fires and emits the trailing (prev-active 1, churned 1) row
    * — the streaming-native answer to "who just left", which no pure
    * aggregation can express (absence is not an event). Emitted rows are
    * (bucket_us, prev_active_inc, churned_inc) increments; summing per
    * bucket reproduces the batch operator's exact counts once the
    * watermark has closed the buckets (spec-gated via a staged two-file
    * replay). Late data beyond the watermark re-opens nothing —
    * the standard watermark contract, same as every windowed agg. */
  def churnStream(events: DataFrame, bucketSeconds: Long,
      watermarkDelay: String = "0 seconds"): Dataset[(Long, Long, Long)] = {
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val busc = bucketSeconds * 1000000L
    // the watermark column must SURVIVE the projection for event-time
    // timeout to resolve — carry ts alongside its micros twin
    events.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), unix_micros(col("ts")), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // watermark passed the end of bucket last+1 with no return:
            // the user churned there; state closes
            val last = state.get
            state.remove()
            Iterator(((last + 1L) * busc, 1L, 1L))
          } else {
            var last = state.getOption.getOrElse(Long.MinValue)
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            rows.map(_._2 / busc).toSeq.distinct.sorted.foreach { b =>
              if (last != Long.MinValue && b > last)
                out += (((last + 1L) * busc, 1L, if (b > last + 1L) 1L else 0L))
              if (b > last) last = b
            }
            state.update(last)
            // fire once the watermark clears bucket last+1 entirely
            state.setTimeoutTimestamp((last + 2L) * busc / 1000L)
            out.iterator
          }
      }
  }

  /** Streaming hour-of-week SPIKE cells — the live twin of x162's
    * [[graft.operators.EventAnalytics.hourOfWeekAnomaly]]. The batch op
    * consumes every (epoch-week, dow, hour) cell; streaming-native those
    * cells are a WATERMARKED 7-day-window count (Spark's tumbling
    * windows align to the epoch, so `window.start / 7d` is exactly the
    * batch op's `div(day, 7)` week index), each emitted ONCE when the
    * watermark closes its week. State is the open weeks' cells —
    * <= 168 per week within the watermark horizon, evicted on close.
    * The dashboard (or the spec) folds closed cells into the per-cell
    * report: n_weeks_active / total / max_week are commutative and the
    * global denominator is a count-distinct over closed week indexes,
    * so the rolled-up spike flags equal the batch op's once the weeks
    * have closed — the same converge-on-close contract as
    * [[churnStream]]. Output per closed cell: (wk, dow, hour, n). */
  def hourOfWeekCellStream(events: DataFrame,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    val us = unix_micros(col("ts"))
    val day = call_function("div", us, lit(86400000000L))
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "7 days"),
        pmod(day + 4L, lit(7L)).as("dow"),
        call_function("div",
          pmod(us, lit(86400000000L)), lit(3600000000L)).as("hour"))
      .agg(count(lit(1)).as("n"))
      .select(
        call_function("div", unix_micros(col("window.start")),
          lit(604800000000L)).as("wk"),
        col("dow"), col("hour"), col("n"))
  }

  /** Streaming CUSUM changepoint monitor — the live twin of x169's
    * [[graft.operators.Temporal.cusumChangepoint]]. State per key is its
    * per-bucket event counts — CALENDAR-BOUNDED (days, not events; the
    * batch op's own per-key boundedness argument), so like
    * [[hourOfWeekStream]] it needs no watermark and never drops late
    * data: a late event lands in its historical bucket and the next
    * estimate self-corrects, which a watermark-evicted design cannot do.
    * Each micro-batch updates the touched keys' counts and re-emits
    * their current changepoint row — the batch statistic recomputed
    * exactly (pure int64 D*C_t - t*T, earliest-bucket tie-break) over
    * the counts seen so far, O(days) per touched key — so the LAST
    * emission per key always equals the batch operator over the
    * batches' union (spec-gated, including a late-data batch). Output:
    * (key, cp_bucket_us, s_abs_scaled, n_buckets). */
  def cusumStream(events: DataFrame, keyCol: String, bucketSeconds: Long)
      : Dataset[(String, Long, Long, Long)] = {
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val busc = bucketSeconds * 1000000L
    events.select(col(keyCol).cast(StringType), unix_micros(col("ts")))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long], (String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
            state: GroupState[Map[Long, Long]]) =>
          var counts = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { r =>
            val bk = Math.floorDiv(r._2, busc)
            counts = counts.updated(bk, counts.getOrElse(bk, 0L) + 1L)
          }
          state.update(counts)
          // the batch fold, verbatim, over the bounded bucket map
          val sorted = counts.toSeq.sortBy(_._1)
          val d = sorted.size.toLong
          val tot = sorted.iterator.map(_._2).sum
          var c = 0L; var t = 0L
          var bestSa = -1L; var bestNbk = 0L
          sorted.foreach { case (bk, n) =>
            t += 1L; c += n
            val sa = math.abs(d * c - t * tot)
            if (sa > bestSa || (sa == bestSa && -bk > bestNbk)) {
              bestSa = sa; bestNbk = -bk
            }
          }
          Iterator((key, -bestNbk * busc, bestSa, d))
      }
  }

  /** Streaming session-window features — the live twin of x100's
    * [[graft.operators.Temporal.sessionFeatures]], built on Spark's
    * NATIVE `session_window` aggregation (engine-managed merging windows
    * + watermark eviction — the built-in sibling of this file's
    * hand-rolled mapGroupsWithState designs, and the reason to prefer it
    * when the semantics fit: merge logic, state store layout, and skew
    * handling come from the engine).
    *
    * The gap duration is `gapSeconds` PLUS ONE MICROSECOND: the built-in
    * merges events whose gap is strictly less than the gap duration
    * (windows are [ts, ts+gap) and merge on OVERLAP, so a gap of exactly
    * `gapSeconds` lands adjacent, not overlapping), while the batch
    * operator's rule is INCLUSIVE (a new session starts only when the
    * gap EXCEEDS gapSeconds). At micros resolution the 1µs pad makes the
    * two rules coincide exactly.
    *
    * Start/end are the session's OWN min/max event micros — not the
    * padded window bounds — and the value total runs the batch op's
    * exact decimal chain, so each row emitted on watermark close is
    * row-identical to its batch feature row (minus the per-key session
    * ordinal, which append mode cannot know without total per-key
    * history; sessions are keyed by (key, start_us) instead). State per
    * key is its OPEN sessions inside the watermark horizon, evicted on
    * close. Output: (key, n_events, start_us, end_us, duration_us,
    * sum_value) per closed session. */
  def sessionWindowStream(events: DataFrame, keyCol: String,
      gapSeconds: Long, valueCol: String,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    require(gapSeconds >= 1L, "gapSeconds must be >= 1")
    val dec = DecimalType(18, 6)
    events.withWatermark("ts", watermarkDelay)
      .groupBy(col(keyCol),
        session_window(col("ts"), s"$gapSeconds seconds 1 microsecond"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        sum(col(valueCol).cast(dec)).as("__sv"))
      .select(col(keyCol), col("n_events"), col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"),
        col("__sv").cast("string").cast("double").as("sum_value"))
  }

  /** Streaming new-vs-returning increments — the live twin of x133's
    * [[graft.operators.EventAnalytics.newVsReturning]]. State per user
    * is its SET of active buckets (calendar-bounded — days, not events),
    * and like [[cusumStream]] it runs with NO watermark so late data
    * self-corrects instead of being dropped: a late event in an EARLIER
    * bucket emits that bucket's activity increment and, when it steals
    * the user's first-seen title, a RETRACTION row (`new_inc` −1) for
    * the bucket previously credited — so per-bucket increment sums equal
    * the batch operator's exact counts over the events seen so far, at
    * any point, not just after a watermark closes (spec-gated including
    * a late-arrival batch).
    *
    * Emitted rows: (bucket_us, active_inc, new_inc). Roll up as
    * n_active = Σ active_inc, n_new = Σ new_inc,
    * n_returning = n_active − n_new per bucket. */
  def newVsReturningStream(events: DataFrame, bucketSeconds: Long)
      : Dataset[(Long, Long, Long)] = {
    require(bucketSeconds >= 1L, "bucketSeconds must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val busc = bucketSeconds * 1000000L
    events.select(col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Set[Long], (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long)],
            state: GroupState[Set[Long]]) =>
          val seen = state.getOption.getOrElse(Set.empty[Long])
          val fresh = rows.map(r => Math.floorDiv(r._2, busc)).toSet -- seen
          if (fresh.isEmpty) Iterator.empty
          else {
            state.update(seen ++ fresh)
            val active = fresh.toSeq.sorted.map(b => (b * busc, 1L, 0L))
            val newMin = (seen ++ fresh).min
            val credit =
              if (seen.isEmpty) Seq((newMin * busc, 0L, 1L))
              else if (newMin < seen.min)
                // first-seen moved earlier: credit the new bucket,
                // retract the stale credit
                Seq((newMin * busc, 0L, 1L), (seen.min * busc, 0L, -1L))
              else Seq.empty
            (active ++ credit).iterator
          }
      }
  }

  /** JVM replica of [[graft.functions.TextFunctions.md5Long]] mod 2 — the
    * deterministic hash arm (md5 hex of the id string, first 15 hex chars
    * as a long). Bit-identical to the Column expression, so streamed arm
    * counts match the batch operator's exactly. */
  private def md5ArmOf(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(key
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = 60 bits: 7 full bytes + the high nibble of the 8th
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xFFL); i += 1 }
    v = (v << 4) | ((dig(7) & 0xF0L) >> 4)
    v % 2L
  }

  private def md5Arm(userId: Long): Long = md5ArmOf(String.valueOf(userId))

  /** Streaming BH-FDR guardrail deltas — the live twin of x230's
    * [[graft.operators.Experiment.fdrBh]]. The whole readout is linear
    * in two families of sufficient statistics, so the stream emits
    * exact DELTAS and the dashboard's rolled sums replay the batch
    * moments at every point (the [[covariateBalanceStream]]
    * convention):
    *   - a ("m", type, obs_bit, rep_bits) row per EVENT — Δst(type)=1,
    *     Δs_obs(type)=obs_bit, Δs_r(type)=rep_bits(r);
    *   - a ("u", "", obs_bit, rep_bits) row on a user's FIRST
    *     appearance — Δnt=1, Δn_obs=obs_bit, Δn_r=rep_bits(r).
    * The per-user state is one Boolean ([[srmStream]]); the B
    * re-randomized arms are the same seeded md5 bits the batch op and
    * its oracle compute, evaluated JVM-side per user. The p-values,
    * thresholds, and step-up itself are a K-row fold the consumer runs
    * on the rolled sums — continuous multiple-metric monitoring with
    * the FALSE-DISCOVERY rate capped while every metric updates live.
    * No watermark: a late event lands in its (type) sums exactly like
    * an on-time one. */
  def fdrBhStream(events: DataFrame, typeCol: String = "event_type",
      b: Int = 64, seed: Int = 11)
      : Dataset[(String, String, Long, Seq[Long])] = {
    require(b >= 19 && b <= 512, s"b must be in [19,512]: $b")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col(typeCol).cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, String, Long, Seq[Long])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, String)],
            state: GroupState[Boolean]) =>
          val obs = md5ArmOf(String.valueOf(userId))
          val reps: Seq[Long] =
            (0 until b).map(r => md5ArmOf(s"$seed|$r|$userId")).toVector
          val metricRows = rows.map(t => ("m", t._2, obs, reps)).toVector
          val userRow =
            if (state.exists) Vector.empty
            else { state.update(true); Vector(("u", "", obs, reps)) }
          (userRow ++ metricRows).iterator
      }
  }

  /** Streaming sample-ratio-mismatch monitor — the live twin of x202's
    * [[graft.operators.Experiment.srmCheck]]. State per (segment, user)
    * is ONE boolean (seen); the first appearance emits a per-arm count
    * DELTA row, so the dashboard's running per-segment sums equal the
    * batch operator's distinct-user arm counts at every point — the
    * guardrail fires DURING the experiment, not at readout. Production
    * evicts state via an event-time timeout once a segment's enrollment
    * window closes. */
  def srmStream(events: DataFrame,
      segmentCol: String = "event_type"): Dataset[(String, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(segmentCol).cast("string"), col("user_id"))
      .as[(String, Long)]
      .groupByKey(identity)
      .flatMapGroupsWithState[Boolean, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[(String, Long)],
            state: GroupState[Boolean]) =>
          rows.foreach(_ => ()) // drain; only first appearance matters
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val arm = md5Arm(key._2)
            Iterator((key._1,
              if (arm == 0L) 1L else 0L, if (arm == 1L) 1L else 0L))
          }
      }
  }

  /** Spark round(x, 6) semantics (HALF_UP via BigDecimal.valueOf), so
    * streamed doubles are bit-identical to the batch operator's. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Streaming covariate-balance deltas — the live twin of x213's
    * [[graft.operators.Experiment.covariateBalance]]. SMD needs only the
    * per-(arm, covariate) sufficient statistics (n, Σx, Σx²), so each
    * user keys its own state (event count, active-day set, seen-type
    * set — calendar/domain-bounded) and every micro-batch emits the
    * user's covariate DELTAS: (arm, covariate, x_new − x_old,
    * x_new² − x_old², first-appearance flag on the n_events row). The
    * dashboard's running sums therefore equal the batch operator's
    * exact moments at every point (the [[srmStream]] delta convention);
    * the SMD itself is a constant-size fold over six sums. No
    * watermark: late data lands in its user's state and the next delta
    * self-corrects. Output: (arm, covariate, dx, dx2, du). */
  def covariateBalanceStream(events: DataFrame,
      typeCol: String = "event_type")
      : Dataset[(Long, String, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), unix_micros(col("ts")),
        col(typeCol).cast("string"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Set[Long], Set[String]),
        (Long, String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, String)],
            state: GroupState[(Long, Set[Long], Set[String])]) =>
          val first = !state.exists
          var (ne, days, types) = state.getOption
            .getOrElse((0L, Set.empty[Long], Set.empty[String]))
          val (oe, od, ot) = (ne, days.size.toLong, types.size.toLong)
          rows.foreach { case (_, us, ty) =>
            ne += 1L
            days += Math.floorDiv(us, 86400000000L)
            types += ty
          }
          state.update((ne, days, types))
          val arm = md5Arm(userId)
          val (nd, nt) = (days.size.toLong, types.size.toLong)
          Iterator(
            (arm, "n_events", ne - oe, ne * ne - oe * oe,
              if (first) 1L else 0L),
            (arm, "n_days", nd - od, nd * nd - od * od, 0L),
            (arm, "n_types", nt - ot, nt * nt - ot * ot, 0L))
      }
  }

  /** Streaming difference-in-differences deltas — the live twin of
    * x215's [[graft.operators.Experiment.diffInDiff]]. The DiD estimate
    * needs only per-arm (n, Σpre, Σpost), so state per user is its two
    * period counts and each micro-batch emits the user's count deltas
    * (arm, dpre, dpost, first-appearance flag) — running sums equal the
    * batch moments at every point, and the post-period side keeps
    * moving while the experiment runs, which is exactly when a DiD
    * dashboard is read. No watermark; late pre-period data
    * self-corrects the same way. Output: (arm, dpre, dpost, du). */
  def didStream(events: DataFrame, cutoff: String)
      : Dataset[(Long, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    val cutUs = java.time.LocalDateTime
      .parse(cutoff.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    events.select(col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long)],
            state: GroupState[(Long, Long)]) =>
          val first = !state.exists
          var (pre, post) = state.getOption.getOrElse((0L, 0L))
          var dpre = 0L; var dpost = 0L
          rows.foreach { case (_, us) =>
            if (us < cutUs) dpre += 1L else dpost += 1L
          }
          state.update((pre + dpre, post + dpost))
          Iterator((md5Arm(userId), dpre, dpost, if (first) 1L else 0L))
      }
  }

  /** Streaming mSPRT — the live twin of x212's
    * [[graft.operators.Experiment.msprt]]. Sequential testing whose whole
    * point is CONTINUOUS peeking only ran in batch until now; this twin
    * re-emits the always-valid p-value table after every micro-batch.
    *
    * State is the per-day (arm-1, arm-0) count map — CALENDAR-BOUNDED
    * (days, not events), the batch op's own boundedness argument — so
    * like [[cusumStream]] it runs with NO watermark and never drops late
    * data: a late event lands in its historical day and the next
    * emission self-corrects every downstream cumulative row. Each
    * micro-batch replays the batch fold verbatim over the day map
    * (exact integer moments t/s1/s2, the identical double expression
    * order, Spark HALF_UP rounding), so the max-seq emission per day is
    * row-identical to the batch operator over the batches' union —
    * spec-gated including a late-arrival batch.
    *
    * The experiment is one logical key; at 100 TB the input would be
    * pre-reduced to per-(day, arm) count deltas by an upstream stateless
    * partial aggregation (the counts are associative), so the single
    * stateful task folds a days-sized delta stream, never the event
    * stream. Output per emission: (seq, day epoch-days, n_days, c1, c0,
    * mean_diff, lambda, p_always_valid, rejected); take max seq per day
    * for the current table. */
  def msprtStream(events: DataFrame, tau: Double = 1.0,
      alpha: Double = 0.05): Dataset[(Long, Long, Long, Long, Long,
      Double, Option[Double], Option[Double], Boolean)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[(Map[Long, (Long, Long)], Long),
        (Long, Long, Long, Long, Long, Double, Option[Double],
          Option[Double], Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[(Long, Long)],
            state: GroupState[(Map[Long, (Long, Long)], Long)]) =>
          var (counts, seq) =
            state.getOption.getOrElse((Map.empty[Long, (Long, Long)], 0L))
          rows.foreach { case (userId, us) =>
            val day = Math.floorDiv(us, 86400000000L)
            val (c1, c0) = counts.getOrElse(day, (0L, 0L))
            counts = counts.updated(day,
              if (md5Arm(userId) == 1L) (c1 + 1L, c0) else (c1, c0 + 1L))
          }
          seq += 1L
          state.update((counts, seq))
          // the batch fold, verbatim, over the bounded day map
          var t = 0L; var s1 = 0L; var s2 = 0L
          counts.toSeq.sortBy(_._1).iterator.map { case (day, (c1, c0)) =>
            val diff = c1 - c0
            t += 1L; s1 += diff; s2 += diff * diff
            val td = t.toDouble; val s1d = s1.toDouble; val s2d = s2.toDouble
            val v = td * ((s2d - s1d * s1d / td) / td)
            val lambda = if (v <= 0.0) None else Some(
              math.sqrt(v / (v + tau)) *
                math.exp(s1d * s1d * tau / (2.0 * v * (v + tau))))
            val p = lambda.map(l => round6(math.min(1.0, 1.0 / l)))
            (seq, day, t, c1, c0, round6(s1d / td), lambda.map(round6), p,
              p.exists(_ < alpha))
          }
      }
  }

  /** Streaming Wilson-guardrail deltas — the live twin of x243's
    * [[graft.operators.Experiment.wilsonGuardrail]]. State per user is
    * one Boolean (converted yet?); the user's FIRST appearance emits
    * (arm, Δn=1, Δk=converted-in-batch), and a later first CONVERSION
    * emits (arm, Δn=0, Δk=1), so the dashboard's rolled per-arm (n, k)
    * equal the batch operator's exact user-level counts at every point
    * and the interval columns come from the SHARED
    * [[graft.operators.Experiment.wilsonOnCounts]] fold — parity by
    * construction. No watermark: a late conversion tightens k exactly
    * like an on-time one. */
  def wilsonStream(events: DataFrame, typeCol: String = "event_type",
      convertType: String = "purchase")
      : Dataset[(Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"),
        (col(typeCol) === convertType).cast("boolean"))
      .as[(Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Boolean)],
            state: GroupState[Boolean]) =>
          val convNow = rows.exists(_._2)
          val arm = md5Arm(userId)
          val out =
            if (!state.exists)
              Iterator((arm, 1L, if (convNow) 1L else 0L))
            else if (!state.get && convNow) Iterator((arm, 0L, 1L))
            else Iterator.empty
          state.update(state.getOption.getOrElse(false) || convNow)
          out
      }
  }

  /** Streaming group-sequential monitor — the live twin of x244's
    * [[graft.operators.Experiment.groupSequential]]. Interim analyses
    * are the whole POINT of a group-sequential design; this twin keeps
    * the user-level sufficient statistics live so every scheduled look
    * reads the current table without reprocessing the event log.
    *
    * State per user (Spark-managed, keyed — scales with the user
    * domain across executors, never one task): (first event us, first
    * `convertType` us, max event us seen). A user emits a row whenever
    * any of the three change (at most three distinct-value transitions
    * plus max-us advances, each a bounded self-correction — late data
    * is handled by emission, not dropped by a watermark). The rolled
    * max-seq row per user IS the batch operator's per-user frame, and
    * (min first_us, max max_us) IS its event-time range, so replaying
    * them through the SHARED
    * [[graft.operators.Experiment.groupSequentialFold]] yields a
    * row-identical 5-look O'Brien-Fleming table — parity by
    * construction, spec-gated including a late-arrival batch.
    *
    * Output: (user_id, arm, first_us, purch_us (None until converted),
    * max_us, seq); take max seq per user for the current frame. */
  def groupSequentialStream(events: DataFrame,
      typeCol: String = "event_type", convertType: String = "purchase")
      : Dataset[(Long, Long, Long, Option[Long], Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), unix_micros(col("ts")),
        (col(typeCol) === convertType).cast("boolean"))
      .as[(Long, Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Option[Long], Long, Long),
        (Long, Long, Long, Option[Long], Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Boolean)],
            state: GroupState[(Long, Option[Long], Long, Long)]) =>
          val (f0, p0, m0, seq0) = state.getOption
            .getOrElse((Long.MaxValue, None: Option[Long], Long.MinValue, 0L))
          var f = f0; var p = p0; var m = m0
          rows.foreach { case (_, us, conv) =>
            if (us < f) f = us
            if (us > m) m = us
            if (conv && p.forall(us < _)) p = Some(us)
          }
          if (f == f0 && p == p0 && m == m0) Iterator.empty
          else {
            val seq = seq0 + 1L
            state.update((f, p, m, seq))
            Iterator((userId, md5Arm(userId), f, p, m, seq))
          }
      }
  }

  /** Streaming UCB1 deltas — the live twin of x248's
    * [[graft.operators.Evaluation.ucbAllocation]]. A bandit allocation
    * policy is ONLINE by definition; the twin follows the
    * freshnessStream ZERO-state convention: each event is a pure
    * projection to (arm, Δn=1, Δreward on the exact 1e-6 integer
    * microgrid) — no flatMapGroupsWithState, no watermark, late pulls
    * are just more deltas. The rolled per-arm (n, s) equal the batch
    * per-arm counts EXACTLY (associative integer sums), and the
    * dashboard re-ranks through the SHARED
    * [[graft.operators.Evaluation.ucbOnCounts]] fold, so the emitted
    * next-pull table is row-identical to the batch operator at every
    * point. Output: (arm, dn, drm). */
  def ucbStream(events: DataFrame, typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    events.select(col(typeCol).cast("string").as("arm"),
      lit(1L).as("dn"),
      round(col(valueCol).cast("double") * lit(1e6))
        .cast("long").as("drm"))

  /** Streaming freshness deltas — the live twin of x263's
    * [[graft.operators.Temporal.decayedVolume]]. Each event emits one
    * (key, event-day, +1) delta (the psiDriftStream ZERO-state
    * convention: a pure projection, no flatMapGroupsWithState, no
    * watermark — late data is just another +1 on its day), and the
    * accumulated per-(key, day) counts are a LOSSLESS projection for
    * the batch operator: replaying them through decayedVolume yields
    * byte-identical effective volumes at any read time, because the
    * staircase weight depends only on (key, day). The dashboard keeps
    * the bounded (key x day) frame and re-folds the >> weights against
    * its own rolling reference day — freshness that ages live without
    * reprocessing the stream. Output: (key, dday, delta). */
  def freshnessStream(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "event_type"): DataFrame =
    events.select(col(keyCol).as("key"), to_date(col(tsCol)).as("dday"),
      lit(1L).as("delta"))
}
