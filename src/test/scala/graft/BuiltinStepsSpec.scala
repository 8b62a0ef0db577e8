package graft

import org.apache.spark.sql.functions._

import graft.operators.BuiltinSteps
import graft.plans._

/** Mirrors reference tests/test_builtin_steps.py + reshape/running-state
  * cases from tests/test_reshape.py and tests/test_steps.py. */
class BuiltinStepsSpec extends SparkSpec {
  import spark.implicits._

  private def ctx = new Context(spark)

  test("drop_duplicate_rows keeps LAST duplicate at FIRST position (builtin_steps.py:43-45)") {
    val df = RowNum.assign(Seq(
      ("a", 1), ("b", 2), ("a", 3), ("c", 4), ("a", 5)
    ).toDF("k", "v"))
    val out = BuiltinSteps.dropDuplicateRows(Seq("k"))(df, ctx, "p")
      .orderBy(col(Events.RowNumCol))
      .select(col("k"), col("v"), col(Events.RowNumCol)).collect()
    // 'a' keeps the LAST value (5) but sits at the FIRST position (row 1)
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq(("a", 5, 1L), ("b", 2, 2L), ("c", 4, 4L)))
  }

  test("drop_duplicate_rows on all columns") {
    val df = RowNum.assign(Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v"))
    val out = BuiltinSteps.dropDuplicateRows()(df, ctx, "p")
    assert(out.count() == 2)
  }

  test("check_unique passes on unique, fails on dup; strip/case flags (builtin_steps.py:78-82)") {
    val ok = RowNum.assign(Seq("x", "y", "z").toDF("c"))
    BuiltinSteps.checkUnique("c")(ok, ctx, "p") // no throw

    val dupAfterStrip = RowNum.assign(Seq(" x", "x ").toDF("c"))
    assertThrows[DataException](BuiltinSteps.checkUnique("c")(dupAfterStrip, ctx, "p"))

    // strip=false: ' x' and 'x ' differ
    BuiltinSteps.checkUnique("c", strip = false)(dupAfterStrip, ctx, "p")

    val dupCase = RowNum.assign(Seq("A", "a").toDF("c"))
    BuiltinSteps.checkUnique("c")(dupCase, ctx, "p") // case-sensitive by default
    assertThrows[DataException](
      BuiltinSteps.checkUnique("c", ignoreCase = true)(dupCase, ctx, "p"))
  }

  test("check_unique missing column is an error (builtin_steps.py:75-77)") {
    val df = RowNum.assign(Seq("x").toDF("c"))
    assertThrows[DataException](BuiltinSteps.checkUnique("nope")(df, ctx, "p"))
  }

  test("sort_by is stable with row-num tiebreak and PRESERVES row numbers " +
      "(builtin_steps.py:104-105; sorted() keeps Record.row_num)") {
    val df = RowNum.assign(Seq(("b", 1), ("a", 2), ("b", 3), ("a", 4)).toDF("k", "v"))
    val out = BuiltinSteps.sortBy("k")(df, ctx, "p")
      .select(col("v"), col(Events.RowNumCol)).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(2, 4, 1, 3)) // stable within key
    // original numbers ride along — renumbering is the renumber=true
    // phase's job, not the sort's
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 4L, 1L, 3L))
    // a phase with only sortBy stays diffable; pivot/explode mark it not
    assert(graft.plans.Phase("p", steps = Seq(BuiltinSteps.sortBy("k"))).diffable)
    assert(!graft.plans.Phase("p",
      steps = Seq(BuiltinSteps.explodeSplit("k", ",", "kk"))).diffable)
  }

  test("filter_rows keeps matching rows (builtin_steps.py:110-138)") {
    val df = RowNum.assign(Seq(1, 2, 3, 4).toDF("v"))
    val out = BuiltinSteps.filterRows(col("v") % 2 === 0)(df, ctx, "p")
    assert(out.select("v").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4))
  }

  test("flatten_all lifts nested structs to parent__child (builtin_steps.py:163-172)") {
    val df = RowNum.assign(
      spark.read.json(Seq("""{"id":1,"loc":{"city":"ny","geo":{"lat":1.5}}}""").toDS))
    val out = BuiltinSteps.flattenAll(df, ctx, "p")
    assert(out.columns.contains("loc__city"))
    assert(out.columns.contains("loc__geo__lat"))
    assert(!out.columns.contains("loc"))
    assert(out.select("loc__geo__lat").head.getDouble(0) == 1.5)
  }

  test("flatten_column collision raises (builtin_steps.py:175-186)") {
    val df = RowNum.assign(
      spark.read.json(Seq("""{"id":1,"loc__city":"x","loc":{"city":"ny"}}""").toDS))
    assertThrows[DataException](BuiltinSteps.flattenColumn("loc")(df, ctx, "p"))
  }

  test("flatten_column non-struct passes through (builtin_steps.py:218-222)") {
    val df = RowNum.assign(Seq(("a", 1)).toDF("s", "v"))
    val out = BuiltinSteps.flattenColumn("s")(df, ctx, "p")
    assert(out.columns.filterNot(Events.internalCols.contains).toSet ==
      df.columns.filterNot(Events.internalCols.contains).toSet)
  }

  test("pivot reshape (R2, tests/test_reshape.py:33-46)") {
    val df = RowNum.assign(Seq(
      ("loc1", "temp", 50.0), ("loc1", "wind", 12.0),
      ("loc2", "temp", 55.0), ("loc2", "wind", 6.0)
    ).toDF("location", "measure", "value"))
    val out = BuiltinSteps.pivot("location", "measure", "value")(df, ctx, "p")
    val r = out.orderBy("location").select("location", "temp", "wind").collect()
    assert(r.map(x => (x.getString(0), x.getDouble(1), x.getDouble(2))).toSeq ==
      Seq(("loc1", 50.0, 12.0), ("loc2", 55.0, 6.0)))
  }

  test("explode_split reshape (R3, tests/test_reshape.py:67-87)") {
    val df = RowNum.assign(Seq(("p1", "en,fr"), ("p2", "de")).toDF("id", "languages"))
    val out = BuiltinSteps.explodeSplit("languages", ",", "language")(df, ctx, "p")
    assert(out.count() == 3)
    assert(out.select(col(Events.RowNumCol)).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L)) // renumbered after reshape (R4)
  }

  test("running sum over row order (R5, tests/test_steps.py:131-141)") {
    val df = RowNum.assign(Seq(10, 20, 30).toDF("v"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(Events.RowNumCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val out = df.withColumn("running", sum(col("v")).over(w))
      .orderBy(col(Events.RowNumCol)).select("running").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 30L, 60L))
  }

  test("row numbers survive filters; appended rows numbered after max (records.py:63-92)") {
    val df = RowNum.assign(Seq("a", "b", "c", "d").toDF("v"))
    val filtered = df.filter(col("v") =!= "b")
    assert(filtered.select(col(Events.RowNumCol)).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 4L))
    val appended = RowNum.appendNumbered(filtered, Seq("e", "f").toDF("v"))
    assert(appended.select(col(Events.RowNumCol)).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("renumber reassigns 1..n in row order (records.py:79-81)") {
    val df = RowNum.assign(Seq("a", "b", "c").toDF("v")).filter(col("v") =!= "a")
    val out = RowNum.renumber(df)
    assert(out.select(col(Events.RowNumCol)).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("check_unique accepts a column LIST: tuple uniqueness (builtin_steps.py:60-66)") {
    val ok = RowNum.assign(Seq(("a", "1"), ("a", "2"), ("b", "1")).toDF("c", "d"))
    BuiltinSteps.checkUnique(Seq("c", "d"))(ok, ctx, "p") // no throw
    val dup = RowNum.assign(Seq(("a", "1"), ("a", "1")).toDF("c", "d"))
    assertThrows[DataException](BuiltinSteps.checkUnique(Seq("c", "d"))(dup, ctx, "p"))
    assertThrows[DataException](
      BuiltinSteps.checkUnique(Seq("c", "nope"))(ok, ctx, "p"))
  }
}
