package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.plans.DataException
import graft.sources.{Format, GraftIO}

/** Mirrors reference tests/test_csv.py + test_json.py edge cases. */
class GraftIOSpec extends SparkSpec {

  private def tmp(content: String, name: String = "t.csv"): String = {
    val dir = Files.createTempDirectory("graft_io")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("read_csv skips leading # comment lines (io.py:39-40)") {
    val p = tmp("# a comment\nname,age\nalice,30\nbob,40\n")
    val df = GraftIO.readCsv(spark, p)
    assert(df.columns.toSeq == Seq("name", "age"))
    assert(df.count() == 2)
  }

  test("read_csv drops blank and comma-only lines (io.py:55-68)") {
    val p = tmp("name,age\nalice,30\n,\n\nbob,40\n")
    val df = GraftIO.readCsv(spark, p)
    assert(df.count() == 2)
  }

  test("read_csv errors on duplicate header names (io.py:41-42)") {
    val p = tmp("name,name\na,b\n")
    assertThrows[DataException](GraftIO.readCsv(spark, p))
  }

  test("read_csv errors on rows with missing fields (io.py:45-55 restval check)") {
    val p = tmp("a,b,c\n1,2,3\n4,5\n")
    val e = intercept[DataException](GraftIO.readCsv(spark, p).count())
    assert(e.getMessage.contains("Fields missing"))
  }

  test("read_csv errors on rows with non-empty extra fields (io.py:53-54)") {
    val p = tmp("a,b,c\n1,2,3\n6,7,8,9\n")
    val e = intercept[DataException](GraftIO.readCsv(spark, p).count())
    assert(e.getMessage.contains("Inconsistent # of fields"))
  }

  test("read_csv drops empty trailing extra fields (io.py:49-51 restkey + is_list_empty)") {
    val p = tmp("a,b,c\n1,2,3\n10,11,12,\n13,14,15,,\n")
    val df = GraftIO.readCsv(spark, p)
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 3)
    assert(df.orderBy(col("a").cast("long")).collect().map(_.getString(2)).toSeq ==
      Seq("3", "12", "15"))
  }

  test("read_csv accepts an empty LAST declared field plus empty extras ('4,5,,')") {
    // tokens = [4, 5, '', '']: first N = (4, 5, null), extras all empty ->
    // keep the row (a greedy strip-then-reparse would misread it as short)
    val p = tmp("a,b,c\n1,2,3\n4,5,,\n")
    val df = GraftIO.readCsv(spark, p)
    assert(df.count() == 2)
    val r = df.orderBy(col("a")).collect()(1)
    assert(r.getString(0) == "4" && r.getString(1) == "5" && r.isNullAt(2))
  }

  test("read_csv skips comma-only lines even with MORE commas than the header (io.py:63-68)") {
    val p = tmp("a,b,c\n1,2,3\n,,,,\n")
    assert(GraftIO.readCsv(spark, p).count() == 1)
  }

  test("read_csv duplicate-header check is quote-aware (quoted delimiter inside a header)") {
    // naive split on ',' would shred "last, first" into fragments and
    // either miss real dups or invent fake ones
    val ok = tmp("\"last, first\",age\nsmith,30\n")
    assert(GraftIO.readCsv(spark, ok).count() == 1)
    val dup = tmp("\"last, first\",\"last, first\"\na,b\n")
    assertThrows[DataException](GraftIO.readCsv(spark, dup))
  }

  test("read_csv custom delimiter") {
    val p = tmp("name|age\nalice|30\n")
    val df = GraftIO.readCsv(spark, p, delimiter = "|")
    assert(df.columns.toSeq == Seq("name", "age"))
    assert(df.head.getString(0) == "alice")
  }

  test("read_csv reads all values as strings (typing happens in Phase)") {
    val p = tmp("n\n1\n2\n")
    assert(GraftIO.readCsv(spark, p).schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.StringType))
  }

  test("read_csv handles quoted values with embedded delimiter") {
    val p = tmp("name,notes\nalice,\"likes, commas\"\n")
    assert(GraftIO.readCsv(spark, p).head.getString(1) == "likes, commas")
  }

  test("unicode round-trip through save_csv/read_csv (test_unicode_end_to_end.py)") {
    import spark.implicits._
    val df = Seq(("Grünkohl", "日本語"), ("ñañ", "emoji 🎉")).toDF("a", "b")
    val out = Files.createTempDirectory("graft_io").resolve("u.csv").toString
    GraftIO.saveCsv(df, out)
    val back = GraftIO.readCsv(spark, out)
    assert(back.orderBy("a").collect().map(_.getString(1)).toSeq ==
      df.orderBy("a").collect().map(_.getString(1)).toSeq)
  }

  test("save_csv normalizes NaN to empty (io.py:87-112)") {
    import spark.implicits._
    val df = Seq(("a", Double.NaN), ("b", 1.5)).toDF("k", "v")
    val out = Files.createTempDirectory("graft_io").resolve("nan.csv").toString
    GraftIO.saveCsv(df, out)
    val content = Files.readString(Paths.get(out))
    assert(!content.toLowerCase.contains("nan"))
  }

  test("save_csv stringifies array values (test_csv.py:148-154)") {
    import spark.implicits._
    val df = Seq(("a", Seq(1, 2, 3))).toDF("k", "v")
    val out = Files.createTempDirectory("graft_io").resolve("arr.csv").toString
    GraftIO.saveCsv(df, out)
    val back = GraftIO.readCsv(spark, out)
    assert(back.head.getString(1) == "[1,2,3]")
  }

  test("json record format round-trip: single top-level array (io.py:14-31)") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val out = Files.createTempDirectory("graft_io").resolve("r.json").toString
    GraftIO.saveJsonRecord(df, out)
    val content = Files.readString(Paths.get(out)).trim
    assert(content.startsWith("[") && content.endsWith("]"))
    val back = GraftIO.readJson(spark, out)
    assert(back.count() == 2)
    assert(back.orderBy("id").collect().map(_.getAs[String]("s")).toSeq == Seq("x", "y"))
  }

  test("format dispatch by extension (constants.py:9-11)") {
    assert(Format.forPath("x.csv") == Format.Csv)
    assert(Format.forPath("x.json") == Format.JsonRecord)
    assert(Format.forPath("x.parquet") == Format.Parquet)
    assertThrows[graft.plans.GraftError](Format.forPath("x.xlsx"))
  }

  test("ExtraMapping <-> key/value table round-trip (io.py:231-242)") {
    val m = Map("us" -> "United States", "fr" -> "France")
    val df = GraftIO.mappingToDf(spark, m)
    assert(df.columns.toSeq == Seq("key", "value"))
    assert(GraftIO.dfToMapping(df) == m)
  }
}
