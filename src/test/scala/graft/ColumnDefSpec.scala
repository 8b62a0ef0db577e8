package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.{ColType, ColumnDef}
import graft.plans.{ErrorPolicy, Events, GraftError}

/** Mirrors reference tests/test_columns.py cast/validate cases. */
class ColumnDefSpec extends SparkSpec {
  import spark.implicits._

  /** Apply one ColumnDef to a single string column "v"; returns
    * (castedValues, errorMessagesPerRow). */
  private def runCol(cdef: ColumnDef, values: Seq[String]): Seq[(Any, Seq[String])] = {
    val df = values.toDF(cdef.name)
    val base = Events.withEventsCol(df)
    val (value, update) = cdef.compile(base(cdef.name))
    val out = base.withColumns(Map(
      cdef.name -> value,
      Events.EventsCol -> update(base(Events.EventsCol))))
    out.select(col(cdef.name), col(Events.EventsCol + ".message")).collect().toSeq
      .map(r => (r.get(0), r.getSeq[String](1)))
  }

  test("IntColumn casts '1.0' to 1 via Decimal (column.py:280-283)") {
    val got = runCol(ColumnDef("n", ColType.IntT), Seq("1", "1.0", "42", "-3.9", ""))
    assert(got.map(_._1) == Seq(1L, 1L, 42L, -3L, null))
    assert(got.forall(_._2.isEmpty))
  }

  test("IntColumn flags unparsable values") {
    val got = runCol(ColumnDef("n", ColType.IntT), Seq("abc"))
    assert(got.head._1 == null)
    assert(got.head._2.exists(_.contains("could not be cast")))
  }

  test("FloatColumn parses via Decimal; empty and NULL-ish are null") {
    val got = runCol(ColumnDef("x", ColType.FloatT), Seq("1.5", "NULL", "None", "nan", " 2.25 "))
    assert(got.map(_._1) == Seq(1.5, null, null, null, 2.25))
  }

  test("BooleanColumn truthy/falsey variants (column.py:192-193, test_columns.py:235)") {
    val got = runCol(ColumnDef("b", ColType.BoolT),
      Seq("t", "TRUE", "1", "yes", "Y", "f", "False", "0", "no", "N"))
    assert(got.map(_._1) == Seq(true, true, true, true, true, false, false, false, false, false))
    assert(got.forall(_._2.isEmpty))
  }

  test("BooleanColumn unrecognized value is an error") {
    val got = runCol(ColumnDef("b", ColType.BoolT), Seq("maybe"))
    assert(got.head._1 == null)
    assert(got.head._2.nonEmpty)
  }

  test("DateColumn: ISO, yyyy/MM/dd, yyyyMMdd all parse (column.py:405-411)") {
    val got = runCol(ColumnDef("d", ColType.DateT()),
      Seq("2024-01-15", "2024/01/15", "20240115"))
    assert(got.map(_._1.toString).distinct == Seq("2024-01-15"))
  }

  test("DateColumn: ambiguous m/d/y rejected without explicit format") {
    val got = runCol(ColumnDef("d", ColType.DateT()), Seq("01/15/2024"))
    assert(got.head._1 == null)
    assert(got.head._2.nonEmpty)
  }

  test("DateColumn with explicit format") {
    val got = runCol(ColumnDef("d", ColType.DateT(Some("MM/dd/yyyy"))), Seq("01/15/2024"))
    assert(got.head._1.toString == "2024-01-15")
  }

  test("DateTimeColumn parses ISO8601") {
    val got = runCol(ColumnDef("ts", ColType.DateTimeT()),
      Seq("2024-01-15T10:30:00", "2024-01-15 10:30:00"))
    assert(got.forall(_._2.isEmpty))
    assert(got.map(_._1.toString).distinct.size == 1)
  }

  test("null=false flags null-ish values incl 'NULL'/'None' literals (io.py:138-148)") {
    val got = runCol(ColumnDef("s", nullable = false), Seq("ok", "", "NULL", "None"))
    assert(got.head._2.isEmpty)
    assert(got.drop(1).forall(_._2.exists(_.contains("Null value"))))
  }

  test("default fills nulls (column.py:176-177)") {
    val got = runCol(ColumnDef("s", default = Some("missing")), Seq("a", null))
    assert(got.map(_._1) == Seq("a", "missing"))
  }

  test("null=false plus default is a definition error (column.py:89-90)") {
    assertThrows[GraftError](ColumnDef("s", nullable = false, default = Some("x")))
  }

  test("column name restrictions (column.py:92-105)") {
    assertThrows[GraftError](ColumnDef(""))
    assertThrows[GraftError](ColumnDef("   "))
    assertThrows[GraftError](ColumnDef("a\tb"))
    assertThrows[GraftError](ColumnDef("a\nb"))
    assert(ColumnDef(" padded ").name == " padded ".trim || ColumnDef(" padded ").name == " padded ")
  }

  test("blank=false flags empty strings (column.py:159-160)") {
    val got = runCol(ColumnDef("s", blank = false, nullable = true), Seq("x", "  "))
    assert(got(0)._2.isEmpty)
    assert(got(1)._2.exists(_.contains("blank")))
  }

  test("allowed_values membership after cast (column.py:161-162)") {
    val got = runCol(ColumnDef("n", ColType.IntT, allowedValues = Seq(1, 2, 3)),
      Seq("1", "2.0", "9"))
    assert(got(0)._2.isEmpty && got(1)._2.isEmpty)
    assert(got(2)._2.exists(_.contains("allowed values")))
  }

  test("min/max range for numeric columns (column.py:273-278)") {
    val got = runCol(ColumnDef("pay", ColType.FloatT, minValue = Some(0.01)),
      Seq("10.5", "0.0", "-4"))
    assert(got(0)._2.isEmpty)
    assert(got(1)._2.exists(_.contains("less than min")))
    assert(got(2)._2.exists(_.contains("less than min")))
  }

  test("fix_value_fn chain: named registry functions (column.py:178-184)") {
    import graft.functions.FixFn._
    val got = runCol(ColumnDef("s", fixValueFns = Seq("strip", "upper")), Seq("  hi  "))
    assert(got.head._1 == "HI")
  }

  test("fix_value capitalize matches Python str.capitalize") {
    val got = runCol(ColumnDef("s", fixValueFns = Seq(graft.functions.FixFn.Named("capitalize"))),
      Seq("hello WORLD"))
    assert(got.head._1 == "Hello world")
  }

  test("custom checks run on the typed value and route through the policy (docs/user/advanced.md custom column validation)") {
    val evenOnly = ColumnDef("n", ColType.IntT,
      customChecks = Seq("is_even" -> ((v: org.apache.spark.sql.Column) => v % 2 =!= 0)))
    val got = runCol(evenOnly, Seq("4", "7", ""))
    assert(got(0)._2.isEmpty)
    assert(got(1)._2.exists(m => m.contains("failed check is_even") && m.contains("7")))
    assert(got(2)._2.isEmpty) // null never reaches a custom check
    // a null-returning predicate never fires (coalesce guard)
    val nullPred = ColumnDef("s",
      customChecks = Seq("never" -> ((_: org.apache.spark.sql.Column) =>
        lit(null).cast("boolean"))))
    assert(runCol(nullPred, Seq("x")).head._2.isEmpty)
  }

  test("make_strict_name canonicalization (column.py:464-480 doctests)") {
    assert(ColumnDef.makeStrictName("Homeworld_Quadrant") == "homeworld quadrant")
    assert(ColumnDef.makeStrictName("Homeworld  quadrant") == "homeworld quadrant")
    assert(ColumnDef.makeStrictName("Homeworld\tquadrant") == "homeworld quadrant")
    assert(ColumnDef.makeStrictName("Homeworld \nquadrant") == "homeworld quadrant")
  }

  test("unknown fix function name is a definition error") {
    assertThrows[GraftError](graft.functions.FixFunctions.byName("no_such_fn"))
  }

  test("DateTimeColumn default_tz anchors naive timestamps; explicit offsets kept (column.py:377-379)") {
    val got = runCol(
      ColumnDef("t", ColType.DateTimeT(defaultTz = Some("America/New_York"))),
      Seq("2020-06-01 12:00:00", "2020-06-01T12:00:00+00:00"))
    val instants = got.map(_._1.asInstanceOf[java.sql.Timestamp].toInstant)
    // naive noon in New York (EDT) = 16:00 UTC; the offset-carrying input
    // keeps its own zone
    assert(instants == Seq(
      java.time.Instant.parse("2020-06-01T16:00:00Z"),
      java.time.Instant.parse("2020-06-01T12:00:00Z")))
    assert(got.forall(_._2.isEmpty))
  }

  test("DateTimeColumn default_tz anchors DATE-ONLY values too ('-01' suffix is not an offset)") {
    // '2024-01-01' ends in '-01', which a suffix-only offset probe would
    // misread as a UTC offset; the reference anchors bare dates in the
    // declared zone like any other naive value (column.py:377-379)
    val got = runCol(
      ColumnDef("t", ColType.DateTimeT(defaultTz = Some("America/New_York"))),
      Seq("2024-01-01", "2024-07-01"))
    val instants = got.map(_._1.asInstanceOf[java.sql.Timestamp].toInstant)
    // midnight in New York: EST (-5) in January, EDT (-4) in July
    assert(instants == Seq(
      java.time.Instant.parse("2024-01-01T05:00:00Z"),
      java.time.Instant.parse("2024-07-01T04:00:00Z")))
    assert(got.forall(_._2.isEmpty))
  }
}
