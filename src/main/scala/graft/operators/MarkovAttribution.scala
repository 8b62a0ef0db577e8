package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain ("removal effect") attribution (Anderl, Becker, von
  * Wangenheim & Schumann 2016): user journeys become a first-order chain
  * over channels with absorbing conversion/null states; a channel's
  * credit is how much the chain's start-to-conversion probability DROPS
  * when every transition into that channel is redirected to null — the
  * data-driven alternative to the positional rules in
  * [[EventAnalytics.touchAttribution]] (x85), which credit touches by
  * decree rather than by measured contribution.
  *
  * Journey extraction: per user, events in (ts, seqCol) order, truncated
  * at the FIRST `convType` event (mapped to the absorbing 'conv');
  * a journey with no conversion absorbs into 'null' after its last
  * event. Transition probabilities divide exact integer counts.
  *
  * Solve: conversion probability is the absorbing-chain fixed point
  * x = b + Qx, evaluated as `iters` Jacobi iterations from x=0 in a
  * PINNED summation order (conv term, then channels alphabetically) so
  * the oracle's generated unrolled SQL reproduces every double
  * bit-for-bit — the x188/x174 generated-unroll convention.
  *
  * 100 TB shape: the per-user windows and the transition groupBy are the
  * only row-scale work; the chain itself lives on a (channels+2)^2-row
  * frame, collected to the driver for the solve (state-space-sized, the
  * k-center bounded-collect convention) — a journey log of any size
  * reduces to one tiny matrix.
  */
object MarkovAttribution {

  def attribute(events: DataFrame, userCol: String, tsCol: String,
      seqCol: String, typeCol: String, convType: String,
      channels: Seq[String], iters: Int = 24): DataFrame = {
    require(channels.nonEmpty && !channels.contains(convType),
      "channels must be non-empty and exclude the conversion type")
    val spark = events.sparkSession
    val chs = channels.sorted

    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(seqCol).asc)
    val wAll = Window.partitionBy(col(userCol))
    val rows = events
      .select(col(userCol), col(tsCol), col(seqCol), col(typeCol))
      .withColumn("rn", row_number().over(w))
      .withColumn("pidx", min(when(col(typeCol) === convType,
        col("rn"))).over(wAll))
      .withColumn("last_rn", max(col("rn")).over(wAll))
      .filter(col("pidx").isNull || col("rn") <= col("pidx"))
    val steps = rows
      .withColumn("src", coalesce(lag(col(typeCol), 1).over(w),
        lit("start")))
      .withColumn("dst", when(col(typeCol) === convType, lit("conv"))
        .otherwise(col(typeCol)))
    val finals = rows
      .filter(col("pidx").isNull && col("rn") === col("last_rn"))
      .select(col(typeCol).as("src"), lit("null").as("dst"))
    val counts = steps.select(col("src"), col("dst")).unionAll(finals)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      // state-space-sized collect: (channels+2)^2 rows at most
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    val srcs = "start" +: chs
    val out = srcs.map(s => s ->
      counts.collect { case ((`s`, _), c) => c }.sum).toMap
    def p(s: String, d: String): Double =
      if (out(s) == 0L) 0.0
      else counts.getOrElse((s, d), 0L).toDouble / out(s).toDouble

    /** `iters` Jacobi rounds with the pinned order: conv + channels
      * alphabetically, skipping `removed`. */
    def solve(removed: Option[String]): Double = {
      val active = chs.filterNot(removed.contains)
      val states = "start" +: active
      var x = states.map(_ => 0.0)
      var i = 0
      while (i < iters) {
        x = states.map { s =>
          active.zip(active.map(d => states.indexOf(d)))
            .foldLeft(p(s, "conv")) { case (acc, (d, di)) =>
              acc + p(s, d) * x(di)
            }
        }
        i += 1
      }
      x.head // x_start
    }

    val pFull = solve(None)
    val removals = chs.map(c => c -> solve(Some(c)))
    val sumRe = removals.foldLeft(0.0) { case (acc, (_, pr)) =>
      acc + (pFull - pr)
    }
    def r6(v: Double): java.lang.Double =
      if (v.isNaN) null
      else BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    import spark.implicits._
    removals.map { case (c, pr) =>
      (c, r6(pFull), r6(pr), r6(pFull - pr),
        if (sumRe == 0.0) null else r6((pFull - pr) / sumRe))
    }.toDF("channel", "p_conv", "p_removed", "removal_effect",
      "attribution")
  }
}
