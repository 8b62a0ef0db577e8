package graft

import org.apache.spark.sql.functions._

import graft.operators.{Experiment, Survival}

/** Kaplan-Meier + log-rank: checked against naive in-test folds using
  * the same integer-day durations and microgrid conventions; the
  * cross-engine gates are x240/x241. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def mkEvents(rows: Seq[(Long, String, String)]) =
    rows.toDF("user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .select("user_id", "ts", "event_type")

  // day0 = 2024-01-01; all users start day0
  private def day(i: Int) = f"2024-01-${i + 1}%02d 12:00:00"

  test("kaplanMeier: risk table and microgrid survival match the definitional fold") {
    // u1 conv d2, u2 censored d5, u3 conv d2, u4 conv d4, u5 censored
    // d4, u6 converts at its FIRST event (t=0)
    val ev = mkEvents(Seq(
      (1L, day(0), "view"), (1L, day(2), "purchase"),
      (2L, day(0), "view"), (2L, day(5), "click"),
      (3L, day(0), "view"), (3L, day(2), "purchase"),
      (4L, day(0), "view"), (4L, day(4), "purchase"),
      (5L, day(0), "view"), (5L, day(4), "click"),
      (6L, day(0), "purchase")))
    val out = Survival.kaplanMeier(ev, "user_id", "ts", "event_type",
      "purchase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // (t, n_risk, d, c): t=0 n=6 d=1; t=2 n=5 d=2; t=4 n=3 d=1 c=1;
    // t=5 n=1 c=1
    assert(out.map(t => (t._1, t._2, t._3, t._4)).toSeq ==
      Seq((0L, 6L, 1L, 0L), (2L, 5L, 2L, 0L), (4L, 3L, 1L, 1L),
        (5L, 1L, 0L, 1L)))
    // survival via the same microgrid log fold
    def micro(n: Long, d: Long): Long =
      if (d == 0L) 0L else math.round(math.log((n - d).toDouble / n) * 1e6)
    val steps = Seq((6L, 1L), (5L, 2L), (3L, 1L), (1L, 0L))
    val cums = steps.map(s => micro(s._1, s._2))
      .scanLeft(0L)(_ + _).tail
    val expected = cums.map(c => r6(math.exp(c.toDouble / 1e6)))
    assert(out.map(_._5).toSeq == expected)
    // sanity: the grid values are within 1e-6 of the exact products
    assert(math.abs(out(1)._5 - 0.5) < 2e-6)
  }

  test("kaplanMeier: a step that exhausts the risk set pins survival to exactly 0.0 and stays 0") {
    val ev = mkEvents(Seq(
      (1L, day(0), "view"), (1L, day(1), "purchase"),
      (2L, day(0), "view"), (2L, day(1), "purchase")))
    val out = Survival.kaplanMeier(ev, "user_id", "ts", "event_type",
      "purchase").collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(4) == 0.0)
  }

  test("logRank: hypergeometric E/V on the exact micro grid match a BigInt fold") {
    val users = (1L to 10L)
    val arms = users.map(Tuple1(_)).toDF("u")
      .withColumn("arm", Experiment.armOf(col("u"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assume(arms.values.toSet.size == 2)
    // user u converts at day (u % 4 + 1) if u odd, censored at day 3
    // if even — mixed ties across arms
    val rows = users.flatMap { u =>
      val base = Seq((u, day(0), "view"))
      if (u % 2 == 1L) base :+ ((u, day((u % 4).toInt + 1), "purchase"))
      else base :+ ((u, day(3), "click"))
    }
    val out = Survival.logRank(mkEvents(rows), "user_id", "ts",
      "event_type", "purchase").collect()(0)
    // naive fold
    val dur = users.map { u =>
      if (u % 2 == 1L) ((u % 4) + 1L, 1L, arms(u))
      else (3L, 0L, arms(u))
    }
    val ts = dur.map(_._1).distinct.sorted
    var o1 = 0L; var e1m = BigInt(0); var vm = BigInt(0)
    for (t <- ts) {
      val atRisk = dur.filter(_._1 >= t)
      val n = BigInt(atRisk.size)
      val n1 = BigInt(atRisk.count(_._3 == 1L))
      val dAll = BigInt(atRisk.count(x => x._1 == t && x._2 == 1L))
      o1 += atRisk.count(x => x._1 == t && x._2 == 1L && x._3 == 1L)
      e1m += (2 * dAll * n1 * 1000000 + n) / (2 * n)
      if (n > 1) {
        val a = dAll * n1 * (n - n1) * (n - dAll)
        val b = n * n * (n - 1)
        vm += (2 * a * 1000000 + b) / (2 * b)
      }
    }
    assert(out.getLong(0) == 10L)
    assert(out.getLong(1) == o1)
    assert(out.getDouble(2) == r6(e1m.toDouble / 1e6))
    assert(out.getDouble(3) == r6(vm.toDouble / 1e6))
    val chi2 = {
      val e1 = e1m.toDouble / 1e6; val v = vm.toDouble / 1e6
      (o1 - e1) * (o1 - e1) / v
    }
    assert(out.getDouble(4) == r6(chi2))
    assert(out.getBoolean(5) == (chi2 > 3.841459))
  }

  test("nelsonAalen: microgrid hazard increments match a BigInt fold; H never decreases") {
    val ev = mkEvents(Seq(
      (1L, day(0), "view"), (1L, day(2), "purchase"),
      (2L, day(0), "view"), (2L, day(5), "click"),
      (3L, day(0), "view"), (3L, day(2), "purchase"),
      (4L, day(0), "view"), (4L, day(4), "purchase"),
      (5L, day(0), "view"), (5L, day(4), "click"),
      (6L, day(0), "purchase")))
    val out = graft.operators.Survival.nelsonAalen(ev, "user_id", "ts",
      "event_type", "purchase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    // risk table identical to the KM fixture
    assert(out.map(t => (t._1, t._2, t._3, t._4)).toSeq ==
      Seq((0L, 6L, 1L, 0L), (2L, 5L, 2L, 0L), (4L, 3L, 1L, 1L),
        (5L, 1L, 0L, 1L)))
    val steps = Seq((6L, 1L), (5L, 2L), (3L, 1L), (1L, 0L))
    val cums = steps.map { case (n, d) =>
      ((BigInt(2) * d * 1000000 + n) / (BigInt(2) * n)).toLong }
      .scanLeft(0L)(_ + _).tail
    assert(out.map(_._5).toSeq ==
      cums.map(c => r6(c.toDouble / 1e6)))
    assert(out.map(_._6).toSeq ==
      cums.map(c => r6(math.exp(-c.toDouble / 1e6))))
    assert(out.map(_._5).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("rmstByArm: per-arm step-curve area matches the definitional micro fold; head interval and tau cap") {
    val users = (1L to 10L)
    val arms = users.map(Tuple1(_)).toDF("u")
      .withColumn("arm", Experiment.armOf(col("u"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assume(arms.values.toSet.size == 2)
    // odd users convert at day (u % 4 + 2); even users censored day 8
    val rows = users.flatMap { u =>
      val base = Seq((u, day(0), "view"))
      if (u % 2 == 1L) base :+ ((u, day((u % 4).toInt + 2), "purchase"))
      else base :+ ((u, day(8), "click"))
    }
    val tau = 6L
    val out = Survival.rmstByArm(mkEvents(rows), "user_id", "ts",
      "event_type", "purchase", tauDays = tau).collect()(0)
    // definitional per-arm fold with the same micro conventions
    def rmstOf(arm: Long): (Long, Double) = {
      val dur = users.filter(arms(_) == arm).map { u =>
        if (u % 2 == 1L) ((u % 4) + 2L, 1L) else (8L, 0L) }
      val grid = dur.map(_._1).distinct.sorted
      var cum = 0L; var dead = false
      val sMicro = grid.map { t =>
        val n = dur.count(_._1 >= t)
        val d = dur.count(x => x._1 == t && x._2 == 1L)
        if (d > 0 && n != d)
          cum += math.round(math.log((n - d).toDouble / n) * 1e6)
        if (n == d) dead = true
        t -> (if (dead) 0L
          else math.round(math.exp(cum.toDouble / 1e6) * 1e6))
      }
      val head = math.min(grid.head, tau) * 1000000L
      val steps = sMicro.filter(_._1 < tau).zipWithIndex.map {
        case ((t, s), i) =>
          val next = sMicro.filter(_._1 < tau).lift(i + 1)
            .map(_._1).getOrElse(tau).min(tau)
          s * (next - t)
      }.sum
      (dur.size.toLong, r6((head + steps).toDouble / 1e6))
    }
    val (n0, r0) = rmstOf(0L); val (n1, r1) = rmstOf(1L)
    assert(out.getLong(0) == tau)
    assert(out.getLong(1) == n0 && out.getLong(2) == n1)
    assert(out.getDouble(3) == r0 && out.getDouble(4) == r1)
    // the diff is computed on the micro sums, so re-derive it the same way
    assert(math.abs(out.getDouble(5) - (r1 - r0)) < 2e-6)
    // sanity: rmst can never exceed tau
    assert(r0 <= tau && r1 <= tau)
  }

  test("logRank: zero variance (no conversions) pins chi2 and the flag NULL") {
    val ev = mkEvents(Seq(
      (1L, day(0), "view"), (1L, day(2), "click"),
      (2L, day(0), "view"), (2L, day(3), "click")))
    val out = Survival.logRank(ev, "user_id", "ts", "event_type",
      "purchase").collect()(0)
    assert(out.getLong(1) == 0L && out.getDouble(3) == 0.0)
    assert(out.isNullAt(4) && out.isNullAt(5))
  }
}
