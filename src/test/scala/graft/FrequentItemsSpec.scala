package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.operators.FrequentItems

/** Exact top-k frequent items: Misra-Gries sketch + candidate recount
  * must equal the naive groupBy-all plan bit for bit, on skewed (certified)
  * AND flat (fallback) distributions. Extension operator — no reference
  * counterpart; the scale rationale is FrequentItems.scala's Scaladoc. */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private def naiveTopK(items: Seq[String], k: Int): Seq[(Long, String, Long)] = {
    val df = items.toDF("item")
      .groupBy("item").agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("item").asc)
    df.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k).select("rk", "item", "n")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
  }

  private def sketchTopK(items: Seq[String], k: Int, capacity: Int): Seq[(Long, String, Long)] = {
    // repartition so the per-partition sketches are genuinely exercised
    FrequentItems.topK(items.toDF("item").repartition(7), "item", k, capacity)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
  }

  test("skewed distribution: sketch path == naive, certificate holds") {
    // zipf-ish: item i appears 500/i times => heavy hitters dominate
    val items = (1 to 40).flatMap(i => Seq.fill(500 / i)(f"w$i%02d"))
    val k = 5
    assert(sketchTopK(items, k, capacity = 64) == naiveTopK(items, k))
  }

  test("flat distribution with tiny capacity: fallback path == naive") {
    // 200 distinct items, all with count 3 => no item exceeds N/capacity
    // for capacity=8, so the certificate MUST fail and the fallback runs
    val items = (1 to 200).flatMap(i => Seq.fill(3)(f"t$i%03d"))
    val k = 4
    assert(sketchTopK(items, k, capacity = 8) == naiveTopK(items, k))
  }

  test("ties break count desc then item asc, matching the SQL replay") {
    val items = Seq("b", "b", "a", "a", "c", "c", "z")
    val out = sketchTopK(items, k = 3, capacity = 16)
    assert(out == Seq((1L, "a", 2L), (2L, "b", 2L), (3L, "c", 2L)))
  }

  test("fewer distinct items than k returns them all") {
    val items = Seq("x", "x", "y")
    val out = sketchTopK(items, k = 10, capacity = 16)
    assert(out == Seq((1L, "x", 2L), (2L, "y", 1L)))
  }

  test("nulls and non-string item columns are handled") {
    val df = Seq(Some(1), Some(1), Some(2), None).toDF("item")
    val out = FrequentItems.topK(df, "item", k = 2, capacity = 16)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "1", 2L), (2L, "2", 1L)))
  }

  test("capacity must exceed k") {
    assertThrows[IllegalArgumentException](
      FrequentItems.topK(Seq("a").toDF("item"), "item", k = 8, capacity = 8))
  }

  // ---- count-min sketch ----

  test("count-min: generous width reproduces exact counts, absent item 0") {
    val items = (1 to 30).flatMap(i => Seq.fill(i)(f"t$i%02d"))
    val df = items.toDF("item").repartition(5)
    val q = Seq("t01", "t15", "t30", "zz_absent").toDF("item")
    val est = FrequentItems.countMin(df, "item", q, "item",
      depth = 4, width = 2048)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 30 distinct items in 4 x 2048 cells: no item collides in all rows
    assert(est == Map("t01" -> 1L, "t15" -> 15L, "t30" -> 30L,
      "zz_absent" -> 0L))
  }

  test("count-min: overestimate-only under forced collisions; cells merge by sum") {
    import graft.operators.FrequentItems.{countMinCells, countMinEstimate}
    val items = (1 to 50).flatMap(i => Seq.fill(1 + i % 7)(s"w$i"))
    val df = items.toDF("item")
    val q = (1 to 50).map(i => s"w$i").toDF("item")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // width 8 forces heavy collisions: every estimate must still be >= exact
    val est = FrequentItems.countMin(df, "item", q, "item",
      depth = 3, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (item, n) =>
      assert(est(item) >= n, s"$item estimated ${est(item)} < exact $n")
    }
    // mergeability: summing the two halves' cells == one-pass cells, so
    // per-corpus sketches combine without re-reading either corpus
    val (h1, h2) = items.splitAt(items.size / 2)
    val merged = countMinCells(h1.toDF("item"), "item", 3, 8)
      .unionAll(countMinCells(h2.toDF("item"), "item", 3, 8))
      .groupBy("r", "bucket").agg(sum(col("n")).as("n"))
    val estMerged = countMinEstimate(merged, q, "item", 3, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estMerged == est)
  }
}
