package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Experiment}

/** Experiment-readout suite: SRM guardrail, Mann-Whitney, quantile
  * treatment effects, and the isotonic min-max fit. Statistics are
  * checked against naive in-test reimplementations over the operator's
  * own deterministic arms (the md5 family is pinned by x17/x82 gates);
  * the cross-engine gates are x200-x203. */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  // 9 users x (uid+1) events each: metric = event count = uid+1, all
  // distinct -> no ties except those we add
  private def mkEvents(counts: Map[Long, Int]) =
    counts.toSeq.flatMap { case (u, n) => Seq.fill(n)((u, "e")) }
      .toDF("user_id", "etype")

  private def armsOf(users: Seq[Long]): Map[Long, Long] = {
    val df = users.toDF("u")
      .withColumn("arm", Experiment.armOf(col("u"), 2))
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("isotonicCalibration: min-max fit pools the violating bins and is monotone") {
    // bins (of 4): rates 0, 0.5, 0.25, 1 -> bins 1-2 pool to 2/6
    val rows = Seq((0.125, 0), (0.125, 0), (0.375, 1), (0.375, 0),
      (0.625, 1), (0.625, 0), (0.625, 0), (0.625, 0), (0.875, 1))
      .toDF("p", "label")
    val out = Evaluation.isotonicCalibration(rows, "p", "label", bins = 4)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq((0L, 2L, 0L, 0.0, 0.0),
      (1L, 2L, 1L, 0.5, 0.333333), (2L, 4L, 1L, 0.25, 0.333333),
      (3L, 1L, 1L, 1.0, 1.0)))
    // monotone by construction
    assert(out.map(_._5).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("mannWhitney: midrank U and tie-corrected z match a naive reimplementation") {
    val counts = (0L until 9L).map(u => u -> (u.toInt % 4 + 1)).toMap
    val events = mkEvents(counts)
    val arms = armsOf(counts.keys.toSeq)
    val out = Experiment.mannWhitney(events, "user_id").collect()(0)
    // naive: midranks over the metric values
    val vals = counts.toSeq.map { case (u, m) => (arms(u), m.toDouble) }
    val sorted = vals.map(_._2).sorted
    def midrank(v: Double): Double = {
      val lo = sorted.indexOf(v) + 1
      val hi = sorted.lastIndexOf(v) + 1
      (lo + hi) / 2.0
    }
    val n1 = vals.count(_._1 == 1L)
    val n0 = vals.size - n1
    val r1 = vals.filter(_._1 == 1L).map(v => midrank(v._2)).sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val n = vals.size
    val ties = sorted.groupBy(identity).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    val z = (u1 - n0 * n1 / 2.0) / math.sqrt(
      n0.toDouble * n1 / 12.0 * ((n + 1.0) - ties.toDouble / (n.toDouble * (n - 1.0))))
    assert(out.getLong(0) == n0 && out.getLong(1) == n1)
    assert(out.getDouble(2) == BigDecimal(u1).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getDouble(3) == BigDecimal(z).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("srmCheck: chi-square flags a forced imbalance and clears a balanced split") {
    val users = (0L until 40L)
    val arms = armsOf(users)
    val (a0, a1) = (arms.values.count(_ == 0L), arms.values.count(_ == 1L))
    val events = users.map(u => (u, "seg")).toDF("user_id", "etype")
    val row = Experiment.srmCheck(events, "user_id", "etype").collect()(0)
    assert(row.getLong(1) == a0 && row.getLong(2) == a1)
    val chi2 = math.pow(a0.toDouble - a1, 2) / (a0 + a1)
    assert(row.getDouble(4) == BigDecimal(chi2).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getBoolean(5) == (row.getDouble(4) > 3.841459))
    // a pathologically imbalanced segment must flag: replicate only arm-0
    // users into a second segment
    val arm0Users = users.filter(u => arms(u) == 0L)
    assume(arm0Users.size >= 5)
    val skewed = events.unionAll(
      arm0Users.map(u => (u, "skewed")).toDF("user_id", "etype"))
    val srm = Experiment.srmCheck(skewed, "user_id", "etype")
      .filter(col("segment") === "skewed").collect()(0)
    assert(srm.getBoolean(5), "all-one-arm segment must be flagged")
  }

  test("covariateBalance: identical arm compositions are balanced; a shifted arm flags") {
    // every user has (uid % 4 + 1) events on one day, one type:
    // composition is identical across hash arms IF the hash is fair on
    // this id range — instead verify against a naive reimplementation
    val counts = (0L until 16L).map(u => u -> (u.toInt % 4 + 1)).toMap
    val evs = counts.toSeq.flatMap { case (u, n) =>
      (1 to n).map(i => (u, f"2024-01-01 00:00:$i%02d", "e"))
    }.toDF("user_id", "ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val arms = armsOf(counts.keys.toSeq)
    val out = Experiment.covariateBalance(evs, "user_id", "ts", "event_type")
      .filter(col("covariate") === "n_events").collect()(0)
    val g0 = counts.filter { case (u, _) => arms(u) == 0L }.values.map(_.toDouble)
    val g1 = counts.filter { case (u, _) => arms(u) == 1L }.values.map(_.toDouble)
    def mv(g: Iterable[Double]) = {
      val m = g.sum / g.size
      (m, g.map(x => x * x).sum / g.size - m * m)
    }
    val (m0, v0) = mv(g0); val (m1, v1) = mv(g1)
    def r6(v: Double) = BigDecimal(v).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(1) == r6(m0) && out.getDouble(2) == r6(m1))
    if (v0 + v1 > 0)
      assert(out.getDouble(3) == r6((m1 - m0) / math.sqrt((v0 + v1) / 2.0)))
    // constant covariate (n_days = 1 for everyone): zero variance -> NULL
    val days = Experiment.covariateBalance(evs, "user_id", "ts", "event_type")
      .filter(col("covariate") === "n_days").collect()(0)
    assert(days.isNullAt(3) && !days.getBoolean(4))
  }

  test("markov attribution: hand-computed removal effects on a 3-journey chain") {
    // A: click -> conv; B: view -> click -> conv; C: view (no conv)
    val evs = Seq(
      (1L, "2024-01-01 00:00:01", 1L, "click"),
      (1L, "2024-01-01 00:00:02", 2L, "purchase"),
      (2L, "2024-01-01 00:00:01", 3L, "view"),
      (2L, "2024-01-01 00:00:02", 4L, "click"),
      (2L, "2024-01-01 00:00:03", 5L, "purchase"),
      (3L, "2024-01-01 00:00:01", 6L, "view"))
      .toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = graft.operators.MarkovAttribution.attribute(
        evs, "user_id", "ts", "event_id", "event_type",
        "purchase", Seq("click", "view"))
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // p_conv = 1/3*1 + 2/3*(1/2) = 2/3; remove click -> 0 (no path);
    // remove view -> 1/3
    assert(out.toSeq == Seq(
      ("click", 0.666667, 0.0, 0.666667, 0.666667),
      ("view", 0.666667, 0.333333, 0.333333, 0.333333)))
  }

  test("qiniCurve: cumulative counts cover everyone; final qini matches the naive formula") {
    val evs = (0L until 30L).flatMap { u =>
      Seq.fill((u % 5 + 1).toInt)((u, "2024-01-10 00:00:00", 1.0)) ++
        Seq.fill((u % 3).toInt)((u, "2024-01-20 00:00:00", 1.0))
    }.toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = Experiment.qiniCurve(evs, "user_id", "ts",
        "2024-01-16 00:00:00", bins = 5)
      .orderBy("bin").collect()
    val last = out.last
    val arms = armsOf(0L until 30L)
    val nt = arms.values.count(_ == 1L)
    val nc = arms.values.count(_ == 0L)
    assert(last.getLong(1) == nt && last.getLong(2) == nc)
    val yt = (0L until 30L).filter(arms(_) == 1L).map(_ % 3).sum
    val yc = (0L until 30L).filter(arms(_) == 0L).map(_ % 3).sum
    val qini = yt - yc.toDouble * nt / nc
    assert(last.getDouble(5) == BigDecimal(qini).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    // cumulative counts are monotone
    assert(out.map(_.getLong(1)).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("msprt: day-1 variance is zero (lambda NULL); later days match the naive formula") {
    val evs = (0L until 20L).flatMap { u =>
      Seq((u, "2024-01-01 03:00:00"), (u, "2024-01-02 03:00:00"),
        (u, "2024-01-03 03:00:00"))
    } ++ (0L until 6L).map(u => (u, "2024-01-02 09:00:00"))
    val df = evs.toDF("user_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = Experiment.msprt(df, "user_id", "ts").orderBy("day").collect()
    assert(out.length == 3)
    assert(out(0).isNullAt(5) && !out(0).getBoolean(7)) // t=1: var 0
    // naive replay for day 3
    val arms = armsOf(0L until 20L)
    val d1 = arms.values.count(_ == 1L) - arms.values.count(_ == 0L)
    val extra = (0L until 6L).count(u => arms(u) == 1L) -
      (0L until 6L).count(u => arms(u) == 0L)
    val diffs = Seq(d1, d1 + extra, d1).map(_.toLong)
    val t = 3.0
    val s1 = diffs.sum.toDouble
    val s2 = diffs.map(x => x * x).sum.toDouble
    val v = t * ((s2 - s1 * s1 / t) / t)
    if (v > 0) {
      val lam = math.sqrt(v / (v + 1.0)) *
        math.exp(s1 * s1 * 1.0 / (2.0 * v * (v + 1.0)))
      assert(out(2).getDouble(5) == BigDecimal(lam).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    } else assert(out(2).isNullAt(5))
  }

  test("e10 flagship: one row per readout metric, single-stat rows carry only delta") {
    val evs = (0L until 20L).flatMap { u =>
      Seq((u, "2024-01-10 00:00:00", 1.0 + u), (u, "2024-01-20 00:00:00", 2.0 + u),
        (u, "2024-01-21 00:00:00", 1.0))
    }.toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .withColumn("event_type", lit("click"))
    val out = graft.examples.ExperimentReadout.run(evs, "user_id", "ts",
        "value", "2024-01-16 00:00:00", "event_type")
      .orderBy("metric").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("mean_y", "mean_y_adj",
      "mw_z", "n_users", "p25", "p50", "p75", "srm_chi2_max",
      "var_reduction"))
    val byMetric = out.map(r => r.getString(0) -> r).toMap
    // single-statistic rows have NULL arm columns
    Seq("mw_z", "srm_chi2_max").foreach { m =>
      assert(byMetric(m).isNullAt(1) && byMetric(m).isNullAt(2))
    }
    assert(!byMetric("srm_chi2_max").isNullAt(3))
    // every user has the same event count: rank variance 0 -> z pinned NULL
    assert(byMetric("mw_z").isNullAt(3))
    // every user has exactly 3 events -> all quantiles 3, diffs 0
    Seq("p25", "p50", "p75").foreach { m =>
      assert(byMetric(m).getDouble(1) == 3.0 && byMetric(m).getDouble(3) == 0.0)
    }
    assert(byMetric("n_users").getDouble(1) +
      byMetric("n_users").getDouble(2) == 20.0)
  }

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def tsOf(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"2024-01-${10 + day} 00:00:00")

  test("diffInDiff: the estimate nets out the shared trend; pre means are the parallel-trends check") {
    // pre = days 0..5 (< 2024-01-16), post = days 6..9
    val users = (0L until 10L)
    val arms = armsOf(users)
    // every user: 2 pre events; control users 3 post, treated 5 post
    val rows = users.flatMap { u =>
      val post = if (arms(u) == 1L) 5 else 3
      Seq.fill(2)((u, tsOf(0))) ++ Seq.fill(post)((u, tsOf(8)))
    }
    val out = graft.operators.Experiment.diffInDiff(
      rows.toDF("user_id", "ts"), "user_id", "ts",
      "2024-01-16 00:00:00").collect()(0)
    val n1 = users.count(u => arms(u) == 1L)
    assume(n1 > 0 && n1 < users.size)
    // pre means equal (2.0 both) -> parallel trends hold; did = 5-3 = 2
    assert(out.getLong(0) == users.size - n1 && out.getLong(1) == n1)
    assert(out.getDouble(2) == 2.0 && out.getDouble(4) == 2.0)
    assert(out.getDouble(3) == 3.0 && out.getDouble(5) == 5.0)
    assert(out.getDouble(6) == 2.0)
  }

  test("powerMde: MDE matches the naive normal-approx formula from exact moments") {
    val counts = (0L until 12L).map(u => u -> (u.toInt % 5 + 1)).toMap
    val events = mkEvents(counts)
    val arms = armsOf(counts.keys.toSeq)
    val out = graft.operators.Experiment.powerMde(events, "user_id")
      .collect()(0)
    def mom(vs: Seq[Int]): (Long, Double, Double) = {
      val n = vs.size.toLong
      val s1 = vs.map(_.toLong).sum.toDouble
      val s2 = vs.map(v => v.toLong * v).sum.toDouble
      (n, s1 / n, s2 / n - (s1 / n) * (s1 / n))
    }
    val (n0, m0, v0) = mom(counts.toSeq.filter(c => arms(c._1) == 0L).map(_._2))
    val (n1, _, v1) = mom(counts.toSeq.filter(c => arms(c._1) == 1L).map(_._2))
    assume(n0 > 0 && n1 > 0)
    val mde = (1.959964 + 0.841621) * math.sqrt(v0 / n0 + v1 / n1)
    assert(out.getLong(0) == n0 && out.getLong(1) == n1)
    assert(out.getDouble(2) == r6(m0))
    assert(out.getDouble(5) == r6(mde))
    assert(out.getDouble(6) == r6(mde / m0))
  }

  test("winsorizedAte: one bot user no longer owns the ATE; clamp bounds are the exact pooled quantiles") {
    // 20 ordinary users with 1..4 events and one bot with 1000
    // (21 users puts the type-1 p95 rank at 20 — inside the ordinary
    // range, so the clamp provably excludes the bot)
    val counts = (0L until 20L).map(u => u -> (u.toInt % 4 + 1)).toMap +
      (99L -> 1000)
    val events = mkEvents(counts)
    val arms = armsOf(counts.keys.toSeq)
    val out = graft.operators.Experiment.winsorizedAte(
      events, "user_id", p = 0.05).collect()(0)
    // pooled type-1 quantiles over the 12 metric values
    def q(vs: Seq[Int], p: Double): Long = {
      val s = vs.sorted
      s((math.ceil(s.size * p) - 1).toInt).toLong
    }
    val all = counts.values.toSeq
    val (lo, hi) = (q(all, 0.05), q(all, 0.95))
    assert(out.getLong(0) == lo && out.getLong(1) == hi)
    assert(hi < 1000L, "the bot value must be clamped away")
    def wmean(vs: Seq[Int]): Double = {
      val c = vs.map(v => math.min(math.max(v.toLong, lo), hi))
      c.sum.toDouble / c.size
    }
    val v0 = counts.toSeq.filter(c => arms(c._1) == 0L).map(_._2)
    val v1 = counts.toSeq.filter(c => arms(c._1) == 1L).map(_._2)
    assume(v0.nonEmpty && v1.nonEmpty)
    assert(out.getDouble(4) == r6(wmean(v0)))
    assert(out.getDouble(5) == r6(wmean(v1)))
    assert(out.getDouble(6) == r6(wmean(v1) - wmean(v0)))
  }

  test("postStratifiedAte: stratum weighting removes the composition confound the raw diff absorbs") {
    // strata are the capped pre-cutoff count; give each user 1 pre event
    // (one stratum) and arm-dependent post counts — in a single stratum
    // the adjusted and unadjusted estimates coincide exactly
    val users = (0L until 12L)
    val arms = armsOf(users)
    val rows = users.flatMap { u =>
      Seq((u, tsOf(0))) ++
        Seq.fill(if (arms(u) == 1L) 4 else 1)((u, tsOf(8)))
    }
    val out = graft.operators.Experiment.postStratifiedAte(
      rows.toDF("user_id", "ts"), "user_id", "ts",
      "2024-01-16 00:00:00").collect()(0)
    val n1 = users.count(u => arms(u) == 1L)
    assume(n1 > 0 && n1 < users.size)
    assert(out.getLong(2) == 1L)                   // one stratum
    assert(out.getDouble(3) == 3.0)                // unadjusted 4-1
    assert(out.getDouble(4) == 3.0)                // single stratum: equal
  }

  test("ksArms: exact D from integer cross-multiplication matches a naive two-sample ECDF scan") {
    val counts = (0L until 14L).map(u => u -> (u.toInt % 5 + 1)).toMap
    val events = mkEvents(counts)
    val arms = armsOf(counts.keys.toSeq)
    val out = graft.operators.Experiment.ksArms(events, "user_id")
      .collect()(0)
    val v0 = counts.toSeq.filter(c => arms(c._1) == 0L).map(_._2.toLong)
    val v1 = counts.toSeq.filter(c => arms(c._1) == 1L).map(_._2.toLong)
    assume(v0.nonEmpty && v1.nonEmpty)
    val d = (1L to 6L).map { v =>
      math.abs(v1.count(_ <= v).toLong * v0.size -
        v0.count(_ <= v).toLong * v1.size)
    }.max
    assert(out.getLong(0) == v0.size && out.getLong(1) == v1.size)
    assert(out.getDouble(2) ==
      r6(d.toDouble / (v0.size.toLong * v1.size)))
  }

  test("permutationTest: observed stat is the exact arm mean diff; constant metric is never extreme-free") {
    val counts = (0L until 16L).map(u => u -> (u.toInt % 5 + 1)).toMap
    val events = mkEvents(counts)
    val arms = armsOf(counts.keys.toSeq)
    val out = Experiment.permutationTest(events, "user_id", b = 64,
      seed = 11).collect()(0)
    val v0 = counts.toSeq.filter(c => arms(c._1) == 0L).map(_._2)
    val v1 = counts.toSeq.filter(c => arms(c._1) == 1L).map(_._2)
    assume(v0.nonEmpty && v1.nonEmpty)
    assert(out.getLong(0) == v0.size && out.getLong(1) == v1.size)
    assert(out.getDouble(2) ==
      r6(v1.sum.toDouble / v1.size - v0.sum.toDouble / v0.size))
    // p is the add-one MC form over the reported extreme count
    assert(out.getLong(3) == 64L)
    assert(out.getDouble(5) == r6((out.getLong(4) + 1.0) / 65.0))
    // determinism: the seeded re-randomization replays bit-identically
    val again = Experiment.permutationTest(events, "user_id", b = 64,
      seed = 11).collect()(0)
    assert(out.toSeq == again.toSeq)
    // constant metric: every replicate stat is 0 = |stat_obs| -> p = 1
    val cst = mkEvents((0L until 20L).map(_ -> 3).toMap)
    val pc = Experiment.permutationTest(cst, "user_id", b = 64, seed = 11)
      .collect()(0)
    assert(pc.getDouble(2) == 0.0 && pc.getDouble(5) == 1.0)
  }

  test("mantelHaenszel: pooled OR matches a naive per-stratum fold; all-convert pins NULL") {
    val users = (0L until 24L)
    val arms = armsOf(users)
    assume(users.count(u => arms(u) == 1L) > 0 &&
      users.count(u => arms(u) == 0L) > 0)
    // stratum = pre-event count (bucketWidth 1): u%2 pre events;
    // conversion pattern varies by user so cells are non-trivial
    val rows = users.flatMap { u =>
      val pre = Seq.fill(u.toInt % 2)((u, tsOf(0), "view"))
      val post =
        if (u % 3 != 0) Seq((u, tsOf(8), "purchase"))
        else Seq((u, tsOf(8), "view"))
      pre ++ post
    }
    val df = rows.toDF("user_id", "ts", "event_type")
    val out = graft.operators.Experiment.mantelHaenszel(df, "user_id",
        "ts", "event_type", "purchase", "2024-01-16 00:00:00")
      .orderBy("stratum").collect()
    // naive replication from the same arm map
    val byStratum = users.groupBy(_ % 2).toSeq.sortBy(_._1)
    var num = BigDecimal(0)
    var den = BigDecimal(0)
    byStratum.foreach { case (s, us) =>
      val a = us.count(u => arms(u) == 1L && u % 3 != 0)
      val b = us.count(u => arms(u) == 1L && u % 3 == 0)
      val c = us.count(u => arms(u) == 0L && u % 3 != 0)
      val dd = us.count(u => arms(u) == 0L && u % 3 == 0)
      val n = (a + b + c + dd).toDouble
      num += BigDecimal(r6(a * dd / n))
      den += BigDecimal(r6(b * c / n))
      val row = out.find(_.getLong(0) == s).get
      assert((row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4)) == (a.toLong, b.toLong, c.toLong, dd.toLong))
    }
    val expected = r6((num / den).toDouble)
    out.foreach(row => assert(row.getDouble(7) == expected))
    // every user converts -> b = c = 0 in every stratum -> OR undefined
    val allConv = users.map(u => (u, tsOf(8), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val nul = graft.operators.Experiment.mantelHaenszel(allConv, "user_id",
      "ts", "event_type", "purchase", "2024-01-16 00:00:00").collect()
    assert(nul.forall(_.isNullAt(7)))
  }

  test("rakeWeights: IPF hits both margins on a 2x2; zero-target cells pin 0; deterministic replay") {
    val cells = Seq(("a1", "b1", 1L), ("a1", "b2", 1L),
      ("a2", "b1", 1L), ("a2", "b2", 1L), ("a3", "b1", 2L))
      .toDF("a", "b", "n")
    val tA = Seq(("a1", 3L), ("a2", 1L)).toDF("a", "t")
    val tB = Seq(("b1", 2L), ("b2", 2L)).toDF("b", "t")
    val out = graft.operators.Experiment.rakeWeights(cells, "a", "b", "n",
        tA, tB, "t", iters = 8)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // a3 has no target mass -> its cells zero out
    assert(out(("a3", "b1"))._2 == 0.0)
    // achieved margins: nS=6, tau_a = t_a * 6 / 4 -> (4.5, 1.5);
    // tau_b = (3, 3)
    def mass(p: ((String, String)) => Boolean): Double =
      out.collect { case (k, (n, w)) if p(k) => w * n }.sum
    assert(math.abs(mass(_._1 == "a1") - 4.5) < 1e-3)
    assert(math.abs(mass(_._1 == "a2") - 1.5) < 1e-3)
    assert(math.abs(mass(_._2 == "b1") - 3.0) < 1e-3)
    assert(math.abs(mass(_._2 == "b2") - 3.0) < 1e-3)
    // pinned solve: bit-identical replay (output is in sorted cell order)
    val again = graft.operators.Experiment.rakeWeights(cells, "a", "b",
      "n", tA, tB, "t", iters = 8)
      .collect().map(r => r.getDouble(3)).toSeq
    assert(again == out.toSeq.sortBy(_._1).map(_._2._2))
  }

  test("fdrBh: the effect metric rejects, flat metrics pin p=1.0, and the rejection set is a rank prefix") {
    val users = (0L until 30L)
    val arms = armsOf(users)
    // "eff" tracks the true arm perfectly; "null1"/"null2" are flat, so
    // every re-randomized stat equals the observed 0 and p pins to 1.0
    val rows = users.flatMap { u =>
      Seq.fill(if (arms(u) == 1L) 10 else 1)((u, "eff")) ++
        Seq.fill(3)((u, "null1")) ++ Seq.fill(2)((u, "null2"))
    }
    val out = graft.operators.Experiment.fdrBh(
        rows.toDF("user_id", "event_type"), "user_id", "event_type",
        b = 64, seed = 11, q = 0.1)
      .orderBy("bh_rank").collect()
    assert(out.length == 3)
    val byType = out.map(r => r.getString(0) -> r).toMap
    assert(byType("eff").getBoolean(6), "the real effect must reject")
    assert(byType("eff").getDouble(3) < 0.1)
    assert(!byType("null1").getBoolean(6) && !byType("null2").getBoolean(6))
    assert(byType("null1").getDouble(3) == 1.0)
    assert(byType("null2").getDouble(3) == 1.0)
    // step-up structure: thresholds are rank*q/K, rejections a prefix
    for ((r, i) <- out.zipWithIndex) {
      assert(r.getInt(4) == i + 1)
      assert(r.getDouble(5) == math.rint((i + 1) * 0.1 / 3 * 1e6) / 1e6)
    }
    val rej = out.map(_.getBoolean(6))
    assert(!rej.sliding(2).exists(w => !w(0) && w(1)),
      "rejections must be a prefix of the p-value rank order")
  }

  test("aipwAte: exactly-linear outcomes recover the model effect; constant covariate collapses to unadjusted") {
    val users = (0L until 16L)
    val arms = armsOf(users)
    // arm 0: y = 1 + 2x; arm 1: y = 3 + 2x; covariate DELIBERATELY
    // imbalanced (arm 1 sits at x+2) so the raw difference is confounded
    // while reg/AIPW recover the true effect 2 exactly
    def xOf(u: Long): Int =
      (if (arms(u) == 1L) 2 else 0) + (u % 2).toInt
    def yOf(u: Long): Int =
      (if (arms(u) == 1L) 3 else 1) + 2 * xOf(u)
    val pre = "2024-01-10 00:00:00"
    val post = "2024-01-20 00:00:00"
    val rows = users.flatMap { u =>
      Seq.fill(xOf(u))((u, pre)) ++ Seq.fill(yOf(u))((u, post))
    }
    val df = rows.toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = graft.operators.Experiment.aipwAte(
      df, "user_id", "ts", cutoff = "2024-01-16 00:00:00").collect()(0)
    assert(out.getDouble(2) == 2.0 && out.getDouble(3) == 2.0,
      s"betas must fit the exact slope: $out")
    assert(out.getDouble(5) == 2.0, s"ate_reg must be the model effect: $out")
    assert(out.getDouble(6) == 2.0, s"zero residuals: AIPW == reg: $out")
    assert(out.getDouble(4) > 2.0,
      s"the confounded raw difference must differ: $out")
    // constant covariate: beta pins 0, every estimate collapses to the
    // unadjusted difference
    val flat = users.flatMap { u =>
      Seq.fill(5)((u, pre)) ++ Seq.fill(yOf(u))((u, post))
    }
    val df2 = flat.toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val o2 = graft.operators.Experiment.aipwAte(
      df2, "user_id", "ts", cutoff = "2024-01-16 00:00:00").collect()(0)
    assert(o2.getDouble(2) == 0.0 && o2.getDouble(3) == 0.0)
    assert(o2.getDouble(4) == o2.getDouble(5) &&
      o2.getDouble(5) == o2.getDouble(6))
  }

  test("clusterAte: between-cluster variance matches a naive fold; a 1-cluster arm pins NULL") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // 8 named clusters, 3 rows each with value = base + offset; arms
    // come from the same md5 hash the operator uses
    val clusters = ('a' to 'h').map(c => s"cl_$c")
    val armOfC = clusters.map(Tuple1(_)).toDF("c")
      .withColumn("arm", graft.operators.Experiment.armOf(col("c"), 2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assume(armOfC.values.toSet.size == 2)
    val rows = clusters.zipWithIndex.flatMap { case (c, i) =>
      Seq((c, 10L * i), (c, 10L * i + 1L), (c, 10L * i + 5L))
    }
    val out = graft.operators.Experiment.clusterAte(
      rows.toDF("c", "v"), "c", "v").collect()(0)
    // naive: cluster means on the 1e-6 grid, sample variance over them
    val means = clusters.zipWithIndex.map { case (c, i) =>
      armOfC(c) -> r6((30L * i + 6L).toDouble / 3.0) }
    def stats(a: Long) = {
      val ms = means.filter(_._1 == a).map(_._2)
      val mean = ms.map(m => BigDecimal(r6(m))).sum.toDouble / ms.size
      val s2 = ms.map(m => BigDecimal(r6(r6(m) * r6(m)))).sum.toDouble
      (ms.size.toLong, mean, (s2 - mean * mean * ms.size) / (ms.size - 1))
    }
    val (k0, m0, v0) = stats(0L); val (k1, m1, v1) = stats(1L)
    assert(out.getLong(0) == k0 && out.getLong(1) == k1)
    assert(out.getDouble(2) == r6(m0) && out.getDouble(3) == r6(m1))
    assert(out.getDouble(4) == r6(m1 - m0))
    assert(math.abs(out.getDouble(5) -
      math.sqrt(v1 / k1 + v0 / k0)) < 1e-6, s"$out")
    // a 1-cluster arm cannot estimate between-cluster variance
    val oneArm = clusters.take(3)
    assume(oneArm.map(armOfC).toSet.size == 2)
    val single = oneArm.groupBy(armOfC).values.find(_.size == 1)
    assume(single.isDefined)
    val o2 = graft.operators.Experiment.clusterAte(
      oneArm.flatMap(c => Seq((c, 1L), (c, 2L))).toDF("c", "v"),
      "c", "v").collect()(0)
    assert(o2.isNullAt(5) && o2.isNullAt(6),
      s"1-cluster arm must pin se/t NULL: $o2")
  }

  test("quantileTreatment: exact type-1 quantiles per arm and their difference") {
    val counts = (0L until 12L).map(u => u -> (u.toInt + 1)).toMap
    val events = mkEvents(counts)
    val arms = armsOf(counts.keys.toSeq)
    val out = Experiment.quantileTreatment(events, "user_id",
        qs = Seq(0.5)).collect()(0)
    def q50(vs: Seq[Int]): Long = {
      val s = vs.sorted
      s((math.ceil(s.size * 0.5) - 1).toInt).toLong
    }
    val v0 = counts.toSeq.filter { case (u, _) => arms(u) == 0L }.map(_._2)
    val v1 = counts.toSeq.filter { case (u, _) => arms(u) == 1L }.map(_._2)
    assume(v0.nonEmpty && v1.nonEmpty)
    assert(out.getDouble(0) == 0.5)
    assert(out.getLong(1) == q50(v0))
    assert(out.getLong(2) == q50(v1))
    assert(out.getLong(3) == q50(v1) - q50(v0))
  }

  test("groupSequential: quintile cutoffs, exact look counts, OBF boundaries, naive-z parity") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val users = (1L to 10L)
    val arms = armsOf(users)
    assume(arms.values.toSet.size == 2)
    def ts(dayFrac: Double) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
        .plusSeconds((dayFrac * 86400.0).toLong))
    // everyone enrolls in the first few minutes; user 1 stretches the
    // range to day 5; users u <= 6 purchase on day (u - 1)
    val rows = users.map(u => (u, ts((u - 1).toDouble / 1440.0), "view")) ++
      Seq((1L, ts(5.0), "view")) ++
      (1L to 6L).map(u => (u, ts((u - 1).toDouble), "purchase"))
    val ev = rows.toDF("user_id", "ts", "event_type")
    val out = graft.operators.Experiment.groupSequential(
      ev, "user_id", "ts", "event_type", "purchase").collect()
    assert(out.length == 5)
    // naive replay
    val usOf = (d: Double) => ts(d).getTime * 1000L
    val lo = usOf(0.0); val hi = usOf(5.0)
    val bounds = Seq(4.562, 3.226, 2.634, 2.281, 2.040)
    for (k <- 1 to 5) {
      val cut = lo + (hi - lo) * k / 5
      val enrolled = users.filter(u => usOf((u - 1).toDouble / 1440.0) <= cut)
      val conv = enrolled.filter(u => u <= 6L && usOf((u - 1).toDouble) <= cut)
      val n1 = enrolled.count(arms(_) == 1L); val n0 = enrolled.size - n1
      val c1 = conv.count(arms(_) == 1L); val c0 = conv.size - c1
      val r = out(k - 1)
      assert(r.getLong(0) == k.toLong)
      assert(r.getLong(1) == n0 && r.getLong(2) == n1)
      assert(r.getLong(3) == c0 && r.getLong(4) == c1)
      assert(r.getDouble(6) == bounds(k - 1))
      val pbar = (c0 + c1).toDouble / (n0 + n1)
      val se = math.sqrt(pbar * (1.0 - pbar) * (1.0 / n1 + 1.0 / n0))
      if (n0 == 0 || n1 == 0 || se == 0.0)
        assert(r.isNullAt(5) && r.isNullAt(7))
      else {
        val z = (c1.toDouble / n1 - c0.toDouble / n0) / se
        assert(r.getDouble(5) == r6(z))
        assert(r.getBoolean(7) == (math.abs(z) > bounds(k - 1)))
      }
    }
  }

  test("ivWald: LATE = ITT / first-stage from integer arm counts; weak-instrument flag") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val users = (1L to 12L)
    val arms = armsOf(users)
    assume(arms.values.toSet.size == 2)
    // uptake (click) for users with u % 3 != 0; outcome purchases = u % 2
    val rows = users.flatMap { u =>
      Seq((u, "view")) ++
        (if (u % 3 != 0) Seq((u, "click")) else Nil) ++
        Seq.fill((u % 2).toInt)((u, "purchase"))
    }
    val out = graft.operators.Experiment.ivWald(
      rows.toDF("user_id", "event_type"), "user_id", "event_type",
      "click", "purchase").collect()(0)
    def stats(a: Long) = {
      val us = users.filter(arms(_) == a)
      (us.size.toLong, us.count(_ % 3 != 0).toLong,
        us.map(_ % 2).sum)
    }
    val (n0, kt0, sy0) = stats(0L); val (n1, kt1, sy1) = stats(1L)
    val itt = sy1.toDouble / n1 - sy0.toDouble / n0
    val p1 = kt1.toDouble / n1; val p0 = kt0.toDouble / n0
    val fs = p1 - p0
    val fsVar = p1 * (1.0 - p1) / n1 + p0 * (1.0 - p0) / n0
    assert(out.getLong(0) == n0 && out.getLong(1) == n1)
    assert(out.getDouble(2) == r6(itt))
    assert(out.getDouble(3) == r6(fs))
    if (fs != 0.0) assert(out.getDouble(4) == r6(itt / fs))
    if (fsVar != 0.0) {
      val f = fs * fs / fsVar
      assert(out.getDouble(5) == r6(f))
      assert(out.getBoolean(6) == (f < 10.0))
    }
    // zero first stage (nobody clicks): late pins NULL
    val out2 = graft.operators.Experiment.ivWald(
      users.map(u => (u, "view")).toDF("user_id", "event_type"),
      "user_id", "event_type", "click", "purchase").collect()(0)
    assert(out2.isNullAt(4) && out2.isNullAt(5) && out2.isNullAt(6))
  }

  test("wilsonGuardrail: interval matches the closed form, stays in [0,1] at extreme p") {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val users = (1L to 10L)
    val arms = armsOf(users)
    // conversion for users with u % 5 == 0 only -> small-k arms
    val rows = users.flatMap { u =>
      Seq((u, "view")) ++
        (if (u % 5 == 0) Seq((u, "purchase")) else Nil)
    }
    val out = graft.operators.Experiment.wilsonGuardrail(
      rows.toDF("user_id", "event_type"), "user_id", "event_type",
      "purchase").collect()
    for (r <- out) {
      val a = r.getLong(0)
      val us = users.filter(arms(_) == a)
      val n = us.size.toDouble
      val k = us.count(_ % 5 == 0).toDouble
      val z = 1.96; val z2 = z * z
      val p = k / n
      val denom = 1.0 + z2 / n
      val center = (p + z2 / (2.0 * n)) / denom
      val half = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) /
        denom
      assert(r.getLong(1) == n.toLong && r.getLong(2) == k.toLong)
      assert(r.getDouble(3) == r6(p))
      assert(r.getDouble(4) == r6(center - half))
      assert(r.getDouble(5) == r6(center + half))
      // the Wilson interval never leaves [0,1], even at k = 0
      assert(r.getDouble(4) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("factorial2: cell counts, main effects, and interaction match the naive hash fold") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val users = (1L to 32L)
    val bits = users.map(Tuple1(_)).toDF("u")
      .withColumn("h", graft.functions.TextFunctions.md5Long(col("u")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every fourth user converts
    val evs = users.flatMap { u =>
      Seq((u, "view")) ++
        (if (u % 4 == 0L) Seq((u, "purchase")) else Nil)
    }.toDF("user_id", "event_type")
    val out = Experiment.factorial2(evs, "user_id", "event_type",
      "purchase").collect()(0)
    val cells = users.groupBy(u =>
      (bits(u) % 2, (bits(u) / 2) % 2)).view.mapValues { us =>
      (us.size.toLong, us.count(_ % 4 == 0L).toLong) }.toMap
    assume(cells.size == 4)
    val (n00, k00) = cells((0L, 0L)); val (n01, k01) = cells((0L, 1L))
    val (n10, k10) = cells((1L, 0L)); val (n11, k11) = cells((1L, 1L))
    assert((out.getLong(0), out.getLong(1)) == ((n00, k00)))
    assert((out.getLong(6), out.getLong(7)) == ((n10, k10)))
    def p(k: Long, n: Long) = k.toDouble / n
    assert(out.getDouble(12) == r6(
      (p(k10, n10) + p(k11, n11)) / 2 - (p(k00, n00) + p(k01, n01)) / 2))
    assert(out.getDouble(14) == r6(
      p(k11, n11) - p(k10, n10) - p(k01, n01) + p(k00, n00)))
  }
}
