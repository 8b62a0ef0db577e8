package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L

  private val steps = Seq("view", "click", "buy")

  test("funnel: greedy earliest walk, strict ordering, depth per user") {
    val ev = Seq(
      // u1 completes in order, with noise events interleaved
      (1L, "view",  ts("2024-01-01 10:00:00")),
      (1L, "error", ts("2024-01-01 10:01:00")),
      (1L, "click", ts("2024-01-01 10:02:00")),
      (1L, "view",  ts("2024-01-01 10:03:00")), // dup step ignored
      (1L, "buy",   ts("2024-01-01 10:04:00")),
      // u2: click BEFORE its first view -> that click can't count
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view",  ts("2024-01-01 10:00:00")),
      // u3: only non-step-1 events -> depth 0, null timestamps
      (3L, "click", ts("2024-01-01 10:00:00")),
      (3L, "buy",   ts("2024-01-01 10:01:00"))
    ).toDF("user_id", "event_type", "ts")

    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "ts", steps)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap

    assert(out(1L) == ((3L, us("2024-01-01 10:00:00"), us("2024-01-01 10:04:00"))))
    assert(out(2L) == ((1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:00:00"))))
    assert(out(3L) == ((0L, -1L, -1L)))
    // u3's noise-only sibling: a user with NO step-type events is absent
    assert(!out.contains(4L))
  }

  test("funnel: same-instant next step does NOT advance (strictly after)") {
    val ev = Seq(
      (1L, "view",  ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00")), // equal ts -> rejected
      (1L, "click", ts("2024-01-01 10:00:01")), // first strictly-after click
      (2L, "view",  ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "ts", steps)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out(1L) == ((2L, us("2024-01-01 10:00:01"))))
    assert(out(2L) == ((1L, us("2024-01-01 10:00:00"))))
  }

  test("funnel: greedy earliest start never loses depth vs a later start") {
    // view@10:00 then buy@10:01, click@10:02, buy@10:03: greedy takes the
    // 10:00 view, skips the too-early buy, then click, then the later buy
    val ev = Seq(
      (1L, "view",  ts("2024-01-01 10:00:00")),
      (1L, "buy",   ts("2024-01-01 10:01:00")),
      (1L, "click", ts("2024-01-01 10:02:00")),
      (1L, "buy",   ts("2024-01-01 10:03:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = EventAnalytics.funnel(ev, "user_id", "event_type", "ts", steps).head()
    assert(r.getLong(1) == 3L && r.getLong(3) == us("2024-01-01 10:03:00"))
  }

  test("funnel plans ONE shuffle: no per-step join chain") {
    val ev = Seq((1L, "view", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val plan = EventAnalytics.funnel(ev, "user_id", "event_type", "ts", steps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel must not join:\n$plan")
    assert(plan.split("Exchange").length - 1 <= 1,
      s"funnel must shuffle at most once:\n$plan")
  }

  test("retentionCohorts: cohort by first bucket, distinct users per offset") {
    // bucketSeconds=60: minute buckets for a readable fixture
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:10")), // u1 cohort minute 0
      (1L, ts("2024-01-01 10:00:50")), // same bucket, still one user
      (1L, ts("2024-01-01 10:02:10")), // active at offset 2
      (2L, ts("2024-01-01 10:00:30")), // u2 cohort minute 0
      (2L, ts("2024-01-01 10:01:30")), // offset 1
      (3L, ts("2024-01-01 10:01:40"))  // u3 cohort minute 1
    ).toDF("user_id", "ts")
    val base = us("2024-01-01 10:00:00") / 60000000L
    val out = EventAnalytics.retentionCohorts(ev, "user_id", "ts", 60L)
      .collect().map(r => (r.getLong(0) - base, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      (0L, 0L) -> 2L, // u1, u2 at their own cohort bucket
      (0L, 1L) -> 1L, // u2
      (0L, 2L) -> 1L, // u1
      (1L, 0L) -> 1L  // u3's cohort
    ))
  }

  test("retentionCohorts plans ONE corpus shuffle and no Expand") {
    val ev = Seq((1L, ts("2024-01-01 10:00:10"))).toDF("user_id", "ts")
    val plan = EventAnalytics.retentionCohorts(ev, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"no COUNT(DISTINCT) Expand:\n$plan")
    assert(!plan.contains("Join"), s"no first-seen self-join:\n$plan")
  }

  test("funnel rejects duplicate or empty step lists") {
    val ev = Seq((1L, "view", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    assertThrows[IllegalArgumentException](
      EventAnalytics.funnel(ev, "user_id", "event_type", "ts", Seq.empty))
    assertThrows[IllegalArgumentException](
      EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "view")))
  }

  test("countOutliers: spike hours flag, constant-volume types never do") {
    // "steady": exactly 3 events every hour for 12 hours (zero variance —
    // nothing may flag). "spiky": 3/hour for 11 hours, 40 in hour 6.
    def hour(h: Int, m: Int) = ts(f"2024-01-01 $h%02d:$m%02d:00")
    val steady = for (h <- 0 until 12; i <- 0 until 3)
      yield (s"e$h$i", "steady", hour(h, i + 1))
    val spiky = (for (h <- 0 until 12 if h != 6; i <- 0 until 3)
      yield (s"s$h$i", "spiky", hour(h, i + 1))) ++
      (0 until 40).map(i => (s"sp$i", "spiky", hour(6, i + 1)))
    val ev = (steady ++ spiky).toDF("event_id", "event_type", "ts")

    val out = EventAnalytics.countOutliers(ev, "event_type", "ts",
      bucketSeconds = 3600L, sigma = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(out.forall(_._1 == "spiky"))
    assert(out.map(_._3).toSeq == Seq(40L))
    assert(out.head._2 == us("2024-01-01 06:00:00"))
    // the integer inequality replayed on the spiky stats: n=12, S=73,
    // SS=1721 -> (12*40-73)^2 = 165649 > 4*(12*1721-73^2) = 61292; and
    // for a 3-count hour (12*3-73)^2 = 1369 < 61292
    assert(math.pow(12 * 40 - 73, 2) > 4 * (12 * 1721 - 73 * 73))
    assert(math.pow(12 * 3 - 73, 2) < 4 * (12 * 1721 - 73 * 73))
  }

  test("funnelWithin: latest-start DP beats greedy; window and tie semantics") {
    def t0(sec: Long) = new Timestamp(1704067200000L + sec * 1000L)
    val ev = Seq(
      // u1: the greedy-killer — earliest A opens a window with no B, a
      // LATER A completes. greedy-from-earliest reports 1; the DP must
      // report 2 (chain A@100 -> B@105, span 5 <= 10)
      (1L, "A", t0(0L), 1L),
      (1L, "A", t0(100L), 2L),
      (1L, "B", t0(105L), 3L),
      // u2: B before any A never chains -> depth 1
      (2L, "B", t0(0L), 4L),
      (2L, "A", t0(50L), 5L),
      // u3: full chain exactly at the window edge (span == window: in)
      (3L, "A", t0(0L), 6L),
      (3L, "B", t0(5L), 7L),
      (3L, "C", t0(10L), 8L),
      // u4: chain exists but spans 11 > 10 -> depth 2 (A->B spans 4)
      (4L, "A", t0(0L), 9L),
      (4L, "B", t0(4L), 10L),
      (4L, "C", t0(11L), 11L),
      // u5: same-instant chaining allowed (non-strict, windowFunnel default)
      (5L, "A", t0(20L), 12L),
      (5L, "B", t0(20L), 13L),
      // u6: only non-step-1 events -> depth 0
      (6L, "C", t0(0L), 14L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.funnelWithin(ev, "user_id", "event_type", "ts",
      Seq("A", "B", "C"), windowSeconds = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 3L, 4L -> 2L, 5L -> 2L, 6L -> 0L))
  }

  test("touchAttribution: first/last/participation counts, window exclusion") {
    def t0(sec: Long) = new Timestamp(1704067200000L + sec * 1000L)
    val ev = Seq(
      // u1: touches ch0@0, ch1@50, conversion@60 (window 100): first=ch0,
      // last=ch1, both participate
      (1L, "view", t0(0L), 1L, 0L),
      (1L, "view", t0(50L), 2L, 1L),
      (1L, "buy", t0(60L), 3L, -1L),
      // u2: only touch is OUTSIDE the window (200s before) -> no credit
      (2L, "view", t0(0L), 4L, 2L),
      (2L, "buy", t0(200L), 5L, -1L),
      // u3: touch AFTER the conversion never counts
      (3L, "buy", t0(10L), 6L, -1L),
      (3L, "view", t0(20L), 7L, 0L)
    ).toDF("user_id", "event_type", "ts", "event_id", "ch")
    val out = EventAnalytics.touchAttribution(ev, "user_id", "event_type",
      "ts", "event_id", convType = "buy", touchType = "view",
      channel = col("ch"), windowSeconds = 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(0L -> ((1L, 0L, 1L)), 1L -> ((0L, 1L, 1L))))
  }

  test("transitionMatrix: per-user consecutive pairs, probabilities sum to 1") {
    val ev = Seq(
      // u1: a -> b -> a -> c   (pairs: a->b, b->a, a->c)
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 10:01:00"), 2L),
      (1L, "a", ts("2024-01-01 10:02:00"), 3L),
      (1L, "c", ts("2024-01-01 10:03:00"), 4L),
      // u2: a -> b              (pair: a->b)
      (2L, "a", ts("2024-01-01 09:00:00"), 5L),
      (2L, "b", ts("2024-01-01 09:05:00"), 6L),
      // u3: single event -> contributes no pair
      (3L, "c", ts("2024-01-01 08:00:00"), 7L),
      // same-instant tie within u4: event_id breaks it (8 before 9)
      (4L, "b", ts("2024-01-01 07:00:00"), 8L),
      (4L, "c", ts("2024-01-01 07:00:00"), 9L)
    ).toDF("user_id", "event_type", "ts", "event_id")

    val out = EventAnalytics.transitionMatrix(ev, "user_id", "event_type",
      "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap

    assert(out(("a", "b")) == ((2L, 2.0 / 3)))
    assert(out(("a", "c")) == ((1L, 1.0 / 3)))
    assert(out(("b", "a"))._1 == 1L)
    assert(out(("b", "c"))._1 == 1L) // the u4 tie resolved by event_id
    assert(!out.keySet.exists(_._1 == "c")) // no c->? pair anywhere
    // probabilities per cur sum to 1 exactly for these denominators
    val byCur = out.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._2).sum)
    byCur.foreach { case (_, p) => assert(math.abs(p - 1.0) < 1e-12) }
  }

  test("typeTimeEntropy: a single-cell type scores 0 bits, a uniform 2-cell type 1 bit") {
    def at(day: Int, hour: Int, i: Int) = new java.sql.Timestamp(
      1704067200000L + day * 86400000L + hour * 3600000L + i * 1000L)
    val ev = (
      // "cron": all events in one (dow, hour) cell -> 0 bits
      (1 to 4).map(i => ("cron", at(0, 3, i))) ++
      // "organic": split evenly across two cells -> exactly 1 bit
      (1 to 2).map(i => ("organic", at(0, 3, i))) ++
      (1 to 2).map(i => ("organic", at(1, 9, i)))
    ).toDF("event_type", "ts")
    val out = EventAnalytics.typeTimeEntropy(ev, "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("cron") == ((4L, 1L, 0.0)))
    assert(out("organic") == ((4L, 2L, 1.0)))
  }

  test("segmentSignatures: canonical sorted sets, counted and ranked") {
    val ev = Seq(
      (1L, "view"), (1L, "click"), (1L, "view"), // {click,view}
      (2L, "click"), (2L, "view"),               // {click,view}
      (3L, "view"),                              // {view}
      (4L, "buy")                                // {buy}
    ).toDF("user_id", "event_type")
    val out = EventAnalytics.segmentSignatures(ev, "user_id", "event_type",
      k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.head == ((1L, "click,view", 2L, 2L)))
    assert(out.map(_._2).toSet == Set("click,view", "view", "buy"))
  }

  test("outOfOrderness: inversion count and worst backward step in exact micros") {
    val ev = Seq(
      // u1 arrival order 1,2,3,4 with one 90s time regression at seq 3
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:05:00")),
      (1L, 3L, ts("2024-01-01 10:03:30")), // 90s late
      (1L, 4L, ts("2024-01-01 10:06:00")),
      // u2 perfectly ordered
      (2L, 5L, ts("2024-01-01 09:00:00")),
      (2L, 6L, ts("2024-01-01 09:01:00"))
    ).toDF("user_id", "event_id", "ts")
    val r = EventAnalytics.outOfOrderness(ev, "user_id", "event_id", "ts")
      .head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 0.25)
    assert(r.getLong(3) == 90000000L) // the watermark must cover 90s
  }

  test("hourOfWeekProfile: epoch DOW arithmetic (1970-01-01 is Thursday=4)") {
    val ev = Seq(
      new java.sql.Timestamp(0L),                      // Thu 00h
      new java.sql.Timestamp(3600000L * 26),           // Fri 02h
      new java.sql.Timestamp(86400000L * 3)            // Sun 00h (day 3)
    ).map(Tuple1(_)).toDF("ts")
    val out = EventAnalytics.hourOfWeekProfile(ev, "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((4L, 0L) -> 1L, (5L, 2L) -> 1L, (0L, 0L) -> 1L))
  }

  test("hourOfWeekAnomaly flags the worst week against the zero-inclusive mean") {
    // cell (Thu, 0h): weeks 0,1,2 carry 1,1,7 events -> max 7, total 9,
    // 3 global weeks: 7*3 > 9*2 -> spike. Cell (Thu, 1h): only week 0
    // carries 1 event; 1*3 > 1*2 -> spike TOO (a single active week
    // always spikes vs its zero-depressed mean — by design: one hot
    // hour in an otherwise dead cell IS an anomaly). Cell (Fri, 0h):
    // 1,1,1 across all three weeks -> 1*3 > 3*2 false -> quiet.
    val wk = 86400000L * 7
    val ev = (
      Seq(0L, wk, 2 * wk) ++ Seq.fill(6)(2 * wk) ++ // Thu 0h: 1,1,7
      Seq(3600000L) ++                              // Thu 1h: week 0 only
      Seq(86400000L, 86400000L + wk, 86400000L + 2 * wk) // Fri 0h: 1,1,1
    ).map(ms => Tuple1(new java.sql.Timestamp(ms))).toDF("ts")
    val out = graft.operators.EventAnalytics.hourOfWeekAnomaly(ev, "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out((4L, 0L)) == ((3L, 9L, 7L, true)))
    assert(out((4L, 1L)) == ((1L, 1L, 1L, true)))
    assert(out((5L, 0L)) == ((3L, 3L, 1L, false)))
  }

  test("funnelSummary: reach counts are cumulative-from-deepest, rates exact") {
    val ev = Seq(
      // u1 full funnel; u2 view+click; u3 view only; u4 none of the steps
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 10:01:00")),
      (3L, "view", ts("2024-01-01 10:00:00")),
      (4L, "error", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnelSummary(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 1.0, 1.0)))
    assert(out(2L) == ((2L, 2.0 / 3, 2.0 / 3)))
    assert(out(3L) == ((1L, 0.5, 1.0 / 3)))
  }

  test("churn / newVsReturning: exact membership deltas per day") {
    def at(day: Int, u: Long) =
      (u, new java.sql.Timestamp(1704067200000L + day * 86400000L))
    // day0 {1,2,3}; day1 {2,3,4}; day2 {4}
    val ev = Seq(at(0, 1L), at(0, 2L), at(0, 3L),
      at(1, 2L), at(1, 3L), at(1, 4L), at(2, 4L))
      .toDF("user_id", "ts")
    val base = 1704067200000000L / 86400000000L * 86400000000L
    val c = EventAnalytics.churn(ev, "user_id", "ts", 86400L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // after day0: 1 of 3 churned; after day1: 2,3 of 3 churned; after
    // day2: user 4 churned (bucket 3 row exists because day2 was active)
    assert(c(base + 86400000000L) == ((3L, 1L, 1.0 / 3)))
    assert(c(base + 2 * 86400000000L) == ((3L, 2L, 2.0 / 3)))
    assert(c(base + 3 * 86400000000L) == ((1L, 1L, 1.0)))
    val nr = EventAnalytics.newVsReturning(ev, "user_id", "ts", 86400L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(nr(base) == ((3L, 3L, 0L)))
    assert(nr(base + 86400000000L) == ((3L, 1L, 2L))) // 4 new; 2,3 return
    assert(nr(base + 2 * 86400000000L) == ((1L, 0L, 1L)))
  }

  test("volumeAutocorr: alternating volume gives exactly -1; gap days are zero-filled") {
    def at(day: Int, i: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L)
    // day counts 1, 2, 1, 2 -> all-integer sums give r = -1 exactly
    val ev = (Seq(at(0, 0)) ++ Seq(at(1, 0), at(1, 1)) ++
      Seq(at(2, 0)) ++ Seq(at(3, 0), at(3, 1)))
      .map(Tuple1(_)).toDF("ts")
    val r = EventAnalytics.volumeAutocorr(ev, "ts", 86400L).head()
    assert(r.getLong(0) == 3L && r.getDouble(1) == -1.0)
    // a silent day enters as 0, not as a spliced pair: days 0 and 2
    // populated, day 1 empty -> pairs (c0, 0) and (0, c2)
    val gap = Seq(at(0, 0), at(2, 0), at(2, 1)).map(Tuple1(_)).toDF("ts")
    val g = EventAnalytics.volumeAutocorr(gap, "ts", 86400L).head()
    assert(g.getLong(0) == 2L) // 3 dense buckets -> 2 pairs
  }

  test("sequenceNll: typical sequences score lower than rare ones; closed-form check") {
    // transitions: a->b x3, a->c x1; V=3 types; alpha=1
    val ev = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 10:01:00"), 2L),
      (2L, "a", ts("2024-01-01 10:00:00"), 3L),
      (2L, "b", ts("2024-01-01 10:01:00"), 4L),
      (3L, "a", ts("2024-01-01 10:00:00"), 5L),
      (3L, "b", ts("2024-01-01 10:01:00"), 6L),
      (4L, "a", ts("2024-01-01 10:00:00"), 7L),
      (4L, "c", ts("2024-01-01 10:01:00"), 8L),
      (5L, "c", ts("2024-01-01 09:00:00"), 9L) // single event: no row
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.sequenceNll(ev, "user_id", "event_type",
      "ts", "event_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // p(b|a) = (3+1)/(4+3) = 4/7; p(c|a) = (1+1)/(4+3) = 2/7
    assert(out(1L) == ((1L, r6(-math.log(4.0 / 7)))))
    assert(out(4L) == ((1L, r6(-math.log(2.0 / 7)))))
    assert(out(4L)._2 > out(1L)._2) // the rare journey scores higher
    assert(!out.contains(5L))
  }

  test("audienceOverlap: lifetime user-set intersections, k^2-bounded") {
    val ev = Seq(
      (1L, "view"), (1L, "click"), (2L, "view"), (2L, "click"),
      (3L, "view"), (4L, "buy"), (1L, "view") // dup (1, view) ignored
    ).toDF("user_id", "event_type")
    val out = EventAnalytics.audienceOverlap(ev, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // view users {1,2,3}, click users {1,2}, buy users {4}
    assert(out(("click", "view")) == ((2L, 3L, 2L, 1.0)))
    assert(!out.keySet.exists(p => p._1 == "buy" || p._2 == "buy"))
  }

  test("UserProfile.run: every user keeps a row; depth/regular default for non-qualifiers") {
    val ev = Seq(
      // u1: full funnel in one session, 4 metronome gaps -> regular
      (1L, "view", ts("2024-01-01 10:00:00"), 1L, 1.0),
      (1L, "click", ts("2024-01-01 10:01:00"), 2L, 2.0),
      (1L, "purchase", ts("2024-01-01 10:02:00"), 3L, 3.0),
      (1L, "view", ts("2024-01-01 10:03:00"), 4L, 1.0),
      (1L, "view", ts("2024-01-01 10:04:00"), 5L, 1.0),
      // u2: one non-step event, too few gaps -> depth 0, regular false
      (2L, "error", ts("2024-01-01 09:00:00"), 6L, 5.5)
    ).toDF("user_id", "event_type", "ts", "event_id", "value")
    val out = graft.examples.UserProfile.run(ev, "user_id", "event_type",
      "ts", "event_id", "value", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(out(1L) == ((1L, 5L, 8.0, 3L, true)))
    assert(out(2L) == ((1L, 1L, 5.5, 0L, false)))
  }

  test("timeToConvert: first-start to earliest-strictly-after conversion, exact micros") {
    val ev = Seq(
      // u1: view at t0, purchase 60s later (an earlier purchase at t0
      // does NOT count — strictly after)
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 10:01:00")),
      // u2: converts 120s after the FIRST view (second view ignored)
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 09:01:00")),
      (2L, "purchase", ts("2024-01-01 09:02:00")),
      // u3: views, never converts
      (3L, "view", ts("2024-01-01 08:00:00")),
      // u4: purchases without a view: not converted
      (4L, "purchase", ts("2024-01-01 08:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = EventAnalytics.timeToConvert(ev, "user_id", "event_type", "ts",
      "view", "purchase", percents = Seq(50)).head()
    assert(r.getLong(0) == 2L)                 // u1, u2
    assert(r.getDouble(1) == 90000000.0)       // median of 60s, 120s
  }

  test("sessionRules: support/confidence/lift from exact basket counts") {
    // 4 users, 1 session each: {a,b}, {a,b,c}, {a}, {b,c}
    val ev = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 10:01:00"), 2L),
      (2L, "a", ts("2024-01-01 10:00:00"), 3L),
      (2L, "b", ts("2024-01-01 10:01:00"), 4L),
      (2L, "c", ts("2024-01-01 10:02:00"), 5L),
      (2L, "a", ts("2024-01-01 10:03:00"), 6L), // dup type in session: ignored
      (3L, "a", ts("2024-01-01 10:00:00"), 7L),
      (4L, "b", ts("2024-01-01 10:00:00"), 8L),
      (4L, "c", ts("2024-01-01 10:01:00"), 9L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.sessionRules(ev, "user_id", "event_type",
      "ts", "event_id", gapSeconds = 1800)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    // N=4 sessions; c(a)=3 c(b)=3 c(c)=2; c(a,b)=2 c(a,c)=1 c(b,c)=2
    assert(out(("a", "b")) == ((2L, 0.5, 2.0 / 3, 2.0 * 4 / (3 * 3))))
    assert(out(("b", "a")) == ((2L, 0.5, 2.0 / 3, 2.0 * 4 / (3 * 3))))
    assert(out(("b", "c")) == ((2L, 0.5, 2.0 / 3, 2.0 * 4 / (3 * 2))))
    assert(out(("c", "b"))._3 == 1.0) // every c-session contains b
    assert(out(("a", "c")) == ((1L, 0.25, 1.0 / 3, 1.0 * 4 / (3 * 2))))
    assert(out.size == 6) // both orientations of 3 pairs
  }

  test("gapRegularity: metronome flagged, bursty not, short users excluded") {
    val ev = Seq(
      // u1: four exact 60s gaps -> variance 0 -> CV 0 -> regular
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:01:00"), 2L),
      (1L, ts("2024-01-01 10:02:00"), 3L),
      (1L, ts("2024-01-01 10:03:00"), 4L),
      (1L, ts("2024-01-01 10:04:00"), 5L),
      // u2: bursty gaps (1s, 1s, 1h, 10s) -> CV >> 0.1 -> organic
      (2L, ts("2024-01-01 10:00:00"), 6L),
      (2L, ts("2024-01-01 10:00:01"), 7L),
      (2L, ts("2024-01-01 10:00:02"), 8L),
      (2L, ts("2024-01-01 11:00:02"), 9L),
      (2L, ts("2024-01-01 11:00:12"), 10L),
      // u3: only 2 gaps -> below minGaps, not judged
      (3L, ts("2024-01-01 10:00:00"), 11L),
      (3L, ts("2024-01-01 10:01:00"), 12L),
      (3L, ts("2024-01-01 10:02:00"), 13L)
    ).toDF("user_id", "ts", "event_id")
    val out = EventAnalytics.gapRegularity(ev, "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((4L, 240000000L, true)))
    assert(out(2L)._1 == 4L && !out(2L)._3)
    assert(!out.contains(3L))
  }

  test("gapRegularity: near-metronome within 10% CV still flags; 2x jitter does not") {
    // gaps 59s, 60s, 61s, 60s: mean 60s, sd ~0.707s, CV ~0.012 -> regular
    val tight = Seq(0L, 59L, 119L, 180L, 240L)
    // gaps 30s, 90s, 30s, 90s: mean 60s, sd 30s, CV 0.5 -> not regular
    val loose = Seq(0L, 30L, 120L, 150L, 240L)
    def evs(u: Long, offs: Seq[Long], base: Long) = offs.zipWithIndex.map {
      case (o, i) => (u, new java.sql.Timestamp(1704103200000L + o * 1000L),
        base + i)
    }
    val ev = (evs(1L, tight, 100L) ++ evs(2L, loose, 200L))
      .toDF("user_id", "ts", "event_id")
    val out = EventAnalytics.gapRegularity(ev, "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(1L) && !out(2L))
  }

  test("negBinFit: moment closed forms; equidispersion pins (r,p) NULL, overdispersion fits") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def evs(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, u) => Seq.fill(c)((u.toLong + 1L, "e")) }
      .toDF("user_id", "event_type")
    // counts 1,1,4: mean 2, var 2 -> dispersion 1, NB2 undefined
    val eq = EventAnalytics.negBinFit(evs(Seq(1, 1, 4)), "user_id")
      .collect()(0)
    assert(eq.getLong(0) == 3L && eq.getDouble(1) == 2.0 &&
      eq.getDouble(2) == 2.0 && eq.getDouble(3) == 1.0)
    assert(eq.isNullAt(4) && eq.isNullAt(5))
    // counts 1,1,1,5: mean 2, var 3 -> r = 4, p = 2/3
    val over = EventAnalytics.negBinFit(evs(Seq(1, 1, 1, 5)), "user_id")
      .collect()(0)
    assert(over.getDouble(1) == 2.0 && over.getDouble(2) == 3.0)
    assert(over.getDouble(3) == 1.5)
    assert(over.getDouble(4) == 4.0 && over.getDouble(5) == r6(2.0 / 3))
  }
}
