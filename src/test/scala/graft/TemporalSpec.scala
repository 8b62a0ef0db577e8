package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join attaches latest prior right row; inclusive on equal timestamps") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 11:00:00"), 110.0),
      ("B", ts("2024-01-01 10:30:00"), 50.0)
    ).toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", ts("2024-01-01 10:30:00"), 1L), // between quotes -> 100.0
      ("A", ts("2024-01-01 11:00:00"), 2L), // equal ts -> inclusive 110.0
      ("A", ts("2024-01-01 09:00:00"), 3L), // before any quote -> null
      ("B", ts("2024-01-01 12:00:00"), 4L), // B's only quote -> 50.0
      ("C", ts("2024-01-01 12:00:00"), 5L)  // no key match -> null
    ).toDF("sym", "tts", "trade_id")

    val joined = Temporal.asofJoin(trades, quotes, "sym", "sym", "tts", "qts")
      .select(col("trade_id"), col("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(joined == Map(
      1L -> Some(100.0), 2L -> Some(110.0), 3L -> None,
      4L -> Some(50.0), 5L -> None))
  }

  test("asof join preserves left row count (left-outer semantics)") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val joined = Temporal.asofJoin(e, o, "user_id", "o_custkey", "ts", "o_orderdate")
    assert(joined.count() == e.count())
  }

  test("sessionize: new session on gap > threshold, per key, boundary is exclusive") {
    import java.sql.Timestamp
    def ts(min: Long, micros: Long = 0): Timestamp = {
      val t = new Timestamp(min * 60000L); t.setNanos((micros * 1000).toInt); t
    }
    val df = Seq(
      // user 1: events at 0, 10, 45 min (gap 35 > 30 => new session), 46
      (1L, 1L, ts(0)), (1L, 2L, ts(10)), (1L, 3L, ts(45)), (1L, 4L, ts(46)),
      // user 2: exactly 30:00.000000 gap is NOT a new session (strict >)
      (2L, 5L, ts(0)), (2L, 6L, ts(30)),
      // user 2: 30 min + 1 microsecond IS
      (2L, 7L, ts(60, 1))
    ).toDF("user_id", "event_id", "ts")
    val out = Temporal.sessionize(df, "user_id", "ts", "event_id", gapSeconds = 1800)
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 5L, 1L), (2L, 6L, 1L), (2L, 7L, 2L)))
  }

  test("sessionize ties on ts break by tieCol deterministically") {
    import java.sql.Timestamp
    val t0 = new Timestamp(0L)
    val df = Seq((1L, 2L, t0), (1L, 1L, t0)).toDF("user_id", "event_id", "ts")
    val out = Temporal.sessionize(df, "user_id", "ts", "event_id", gapSeconds = 1)
      .select("event_id", "session_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 1L)))
  }

  test("resampleGapFill: dense scaffold, zero-filled gaps, forward fill") {
    // key a: observations in hour buckets 0 and 2 (gap at 1);
    // key b: only hour 1 — its hours 0 and 2 come from the GLOBAL range
    val df = Seq(
      ("a", ts("1970-01-01 00:10:00"), 1.5),
      ("a", ts("1970-01-01 00:20:00"), 2.5),
      ("a", ts("1970-01-01 02:59:00"), 10.0),
      ("b", ts("1970-01-01 01:00:00"), 7.0)
    ).toDF("k", "ts", "v")
    val out = Temporal.resampleGapFill(df, "k", "ts", "v", bucketSeconds = 3600L)
      .select(col("k"), hour(col("bucket_start")).as("h"), col("n"),
        col("sum_value"), col("filled_value"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2),
         if (r.isNullAt(3)) None else Some(r.getDouble(3)),
         if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // every (key, hour 0..2) pair materialized: 6 rows
    assert(out.size == 6)
    assert(out(("a", 0)) == ((2L, Some(4.0), Some(4.0))))
    // gap bucket: n=0, null sum, forward-filled from hour 0
    assert(out(("a", 1)) == ((0L, None, Some(4.0))))
    assert(out(("a", 2)) == ((1L, Some(10.0), Some(10.0))))
    // before b's first observation: nothing to carry -> null fill
    assert(out(("b", 0)) == ((0L, None, None)))
    assert(out(("b", 1)) == ((1L, Some(7.0), Some(7.0))))
    assert(out(("b", 2)) == ((0L, None, Some(7.0))))
  }

  test("ewma: seeded recurrence in (ts, tie) order; single-event key returns its value") {
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val ev = Seq(
      // u1: values 1, 2, 3 in time order; alpha 0.5 ->
      // w = ((1*0.5 + 0.5*2) = 1.5) * 0.5 + 0.5*3 = 2.25
      (1L, ts(0L), 1L, 1.0), (1L, ts(10L), 2L, 2.0), (1L, ts(20L), 3L, 3.0),
      // u2: same-instant tie resolved by event_id (4 before 5):
      // w = 10*0.5 + 0.5*20 = 15
      (2L, ts(0L), 4L, 10.0), (2L, ts(0L), 5L, 20.0),
      // u3: single event -> its own value
      (3L, ts(0L), 6L, 42.5)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = graft.operators.Temporal
      .ewma(ev, "user_id", "ts", "event_id", "value", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((3L, 2.25)))
    assert(out(2L) == ((2L, 15.0)))
    assert(out(3L) == ((1L, 42.5)))
  }

  test("debounce: hour-long burst collapses to one; separate bursts and types survive") {
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val ev = Seq(
      // u1 click burst: events every 30s for 4 events (chain gaps < 60s)
      // -> ONE survivor even though the burst spans 90s > window
      (1L, "click", ts(0L), 1L), (1L, "click", ts(30L), 2L),
      (1L, "click", ts(60L), 3L), (1L, "click", ts(90L), 4L),
      // second burst 5 minutes later -> its first event survives
      (1L, "click", ts(400L), 5L),
      // same user, different type inside the burst: independent stream
      (1L, "view", ts(10L), 6L),
      // u2 single event
      (2L, "click", ts(0L), 7L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val kept = graft.operators.Temporal
      .debounce(ev, "user_id", "event_type", "ts", "event_id",
        withinSeconds = 60)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 6L, 7L))
  }

  test("sessionFeatures: per-session counts, exact micros duration, decimal value sum") {
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val base = 1704067200000000L
    val ev = Seq(
      // u1 session 1: 3 events over 90s; session 2 after a >30min gap
      (1L, ts(0L), 1L, 1.25), (1L, ts(30L), 2L, 2.50), (1L, ts(90L), 3L, 0.25),
      (1L, ts(90L + 1801L), 4L, 10.00),
      // u2: single event
      (2L, ts(5L), 5L, 7.75)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = graft.operators.Temporal
      .sessionFeatures(ev, "user_id", "ts", "event_id",
        gapSeconds = 1800, valueCol = "value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getDouble(6))).toMap
    assert(out((1L, 1L)) == ((3L, base, 90000000L, 4.0)))
    assert(out((1L, 2L)) == ((1L, base + 1891L * 1000000L, 0L, 10.0)))
    assert(out((2L, 1L)) == ((1L, base + 5000000L, 0L, 7.75)))
  }

  test("cusumChangepoint: finds the level-shift bucket, exact scaled statistic") {
    def dayTs(d: Int, i: Int) =
      new java.sql.Timestamp(d * 86400000L + i * 1000L)
    // key "a": 6 days at counts 2,2,2,8,8,8 — shift after day 2 (0-based),
    // |S| peaks at t=3 (day index 2): D*C_t - t*T = 6*6 - 3*30 = -54.
    val rows = for {
      (n, d) <- Seq(2, 2, 2, 8, 8, 8).zipWithIndex
      i <- 1 to n
    } yield ("a", dayTs(d, i))
    val df = rows.toDF("k", "ts")
    val out = Temporal.cusumChangepoint(df, "k", "ts", 86400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(("a", 2L * 86400000000L, 54L, 6L)))
  }

  test("cusumChangepoint tie breaks to the earliest bucket") {
    def dayTs(d: Int, i: Int) =
      new java.sql.Timestamp(d * 86400000L + i * 1000L)
    // symmetric series 1,3,1: S_1 = 3*1-1*5 = -2, S_2 = 3*4-2*5 = 2 —
    // equal |S|, must pick day 0
    val rows = for {
      (n, d) <- Seq(1, 3, 1).zipWithIndex
      i <- 1 to n
    } yield ("a", dayTs(d, i))
    val out = Temporal.cusumChangepoint(rows.toDF("k", "ts"), "k", "ts", 86400L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((0L, 2L)))
  }

  test("theilSenSlope: lower-median pairwise slope shrugs off the outlier day OLS can't") {
    def dayTs(d: Int, i: Int) =
      new java.sql.Timestamp(d * 86400000L + i * 1000L)
    // daily counts 1,2,3,4,50: the true trend is +1/day; the day-4 spike
    // drags OLS to ~10.6/day but the pairwise-slope median stays small
    val rows = for {
      (n, d) <- Seq(1, 2, 3, 4, 50).zipWithIndex
      i <- 1 to n
    } yield ("a", dayTs(d, i))
    val out = Temporal.theilSenSlope(rows.toDF("k", "ts"), "k", "ts", 86400L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    assert(out._1 == 10L) // 5 days -> 10 pairs
    assert(out._2 == 1.0) // 5th smallest of the 10 sorted slopes
  }

  test("holtLinear matches the hand-run level/trend recurrence") {
    def dayTs(d: Int) = new java.sql.Timestamp(d * 86400000L)
    val df = Seq(("a", dayTs(0), 10.0), ("a", dayTs(1), 12.0),
      ("a", dayTs(2), 9.0), ("a", dayTs(3), 15.0)).toDF("k", "ts", "v")
    val r = Temporal.holtLinear(df, "k", "ts", "v", 86400L,
      alpha = 0.5, beta = 0.3).collect().head
    // l1=10,b1=0; l2=11,b2=.3; l3=10.15,b3=-.045; l4=12.5525,b4=.68925
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 12.5525)
    assert(r.getDouble(3) == 0.68925)
    assert(r.getDouble(4) == 13.24175)
  }

  test("seasonalNaiveBacktest: a perfectly weekly series scores mase 0; gaps align by value") {
    def dayTs(d: Int) = new java.sql.Timestamp(d * 86400000L)
    // 21 days of period-7 values — seasonal naive is exact (mae_s = 0),
    // plain naive is not; drop day 10 to exercise value-aligned joins
    val df = (0 until 21).filter(_ != 10)
      .map(d => ("a", dayTs(d), (d % 7 + 1).toDouble))
      .toDF("k", "ts", "v")
    val r = Temporal.seasonalNaiveBacktest(df, "k", "ts", "v", 86400L, 7)
      .collect().head
    // n1: consecutive-day pairs (18: d=1..20 minus d=10 and d=11); nS:
    // day d vs d-7 pairs where both exist (12: days 7..20 minus d=10 and
    // d=17)
    assert((r.getLong(1), r.getLong(3)) == ((18L, 12L)))
    assert(r.getDouble(4) == 0.0) // mae_s
    assert(r.getDouble(2) > 0.0)  // mae1
    assert(r.getDouble(5) == 0.0) // mase
  }

  test("haarVolume: exact integer coefficients on a hand series; missing days are zero") {
    import spark.implicits._
    // daily counts [3,1,4,2] over 4 days
    val rows = Seq.fill(3)(0) ++ Seq.fill(1)(1) ++ Seq.fill(4)(2) ++
      Seq.fill(2)(3)
    val ev = rows.map(d => Tuple1(java.sql.Timestamp.valueOf(
        f"2024-01-${d + 1}%02d 10:00:00")))
      .toDF("ts")
    val out = graft.operators.Temporal.haarVolume(ev, "ts", days = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // l1: (3-1)=2, (4-2)=2; l2: (4-6)=-2; approx: 10
    assert(out.toSeq == Seq((1L, 0L, 2L), (1L, 1L, 2L), (2L, 0L, -2L),
      (3L, 0L, 10L)))
    // a day with no events contributes an exact zero leaf
    val sparse = Seq(0, 0, 3, 3).map(d => Tuple1(
        java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 10:00:00")))
      .toDF("ts")
    val o2 = graft.operators.Temporal.haarVolume(sparse, "ts", days = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // leaves [2,0,0,2]: l1 2, -2; l2 2-2=0... wait: s1=2, s2=2 -> 0
    assert(o2.toSeq == Seq((1L, 0L, 2L), (1L, 1L, -2L), (2L, 0L, 0L),
      (3L, 0L, 4L)))
  }

  test("decayedVolume: staircase >> weights are exact; ages measured from the stream max date") {
    def dayTs(d: Int) = new java.sql.Timestamp(d * 86400000L)
    // ref = day 5; ages 5,4,3,2,1,0 at h=2 -> steps 2,2,1,1,0,0 ->
    // micro weights 250k,250k,500k,500k,1M,1M -> eff = 3.5
    val df = (0 to 5).map(d => ("a", dayTs(d))).toDF("k", "ts")
    val r = Temporal.decayedVolume(df, "ts", "k", halfLifeDays = 2)
      .collect().head
    assert(r.getLong(1) == 6L)
    assert(r.getDouble(2) == 3.5)
    assert(r.getDouble(3) == BigDecimal(3.5 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a key whose events are all stale decays toward 0 but counts fully
    val mixed = ((0 to 5).map(d => ("new", dayTs(d + 60))) ++
      (0 to 5).map(d => ("old", dayTs(d)))).toDF("k", "ts")
    val out = Temporal.decayedVolume(mixed, "ts", "k", halfLifeDays = 2)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(out(0)._1 == "new" && out(0)._3 == 3.5)
    assert(out(1)._1 == "old" && out(1)._2 == 6L && out(1)._3 < 0.001)
  }

  test("ttlAudit: strictly-past-window rows counted with exact payload reclaim bytes") {
    def dayTs(d: Int) = new java.sql.Timestamp(d * 86400000L)
    // ref = day 30; ttl 10 -> ages 30 and 15 expired, age 0 retained;
    // age exactly 10 is NOT expired (strict >)
    val df = Seq(("a", dayTs(0), "xxxx"), ("a", dayTs(15), "yy"),
      ("a", dayTs(20), "zzz"), ("a", dayTs(30), "w"))
      .toDF("k", "ts", "props")
    val out = Temporal.ttlAudit(df, "ts", "k",
      payloadCols = Seq("props", "k"), ttlDays = 10).collect()(0)
    assert(out.getLong(1) == 4L && out.getLong(2) == 2L)
    assert(out.getDouble(3) == 0.5)
    // reclaim: (4+1) + (2+1) = 8 bytes; day-20 row (age 10) stays
    assert(out.getLong(4) == 8L)
  }
}
