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

  test("read_csv reads latin1 files via the encoding parameter (test_csv.py:102-105)") {
    val dir = Files.createTempDirectory("graft_io_l1")
    val p = dir.resolve("latin1.csv")
    // "José" in latin1: the é is single byte 0xE9 — invalid as UTF-8, so a
    // default read would mangle it; the header probe and the Spark reader
    // must both decode with the declared charset
    Files.write(p, "\n\nid,name\n1,José\n".getBytes("ISO-8859-1"))
    val df = GraftIO.readCsv(spark, p.toString, encoding = "ISO-8859-1")
    val r = df.collect().head
    assert((r.getString(0), r.getString(1)) == ("1", "José"))
    // round-trip: save back as latin1, bytes decode under latin1 again
    val out = dir.resolve("out.csv").toString
    GraftIO.saveCsv(df, out, encoding = "ISO-8859-1")
    val back = new String(Files.readAllBytes(Paths.get(out)), "ISO-8859-1")
    assert(back.contains("José"))
    assert(!new String(Files.readAllBytes(Paths.get(out)), "UTF-8").contains("José"))
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
    assert(Format.forPath("x.orc") == Format.Orc)
    assertThrows[graft.plans.GraftError](Format.forPath("x.xlsx"))
  }

  test("orc round-trip preserves schema and values; filters push to the orc scan") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val df = spark.range(100).selectExpr(
      "id", "CAST(id * 2 AS DOUBLE) AS d", "CAST(id AS STRING) AS s")
    GraftIO.save(df, s"$dir/t.orc")
    val back = GraftIO.read(spark, s"$dir/t.orc")
    // file readback is nullable (same as parquet) — compare names/types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy(col("id")).collect().toSeq ==
      df.orderBy(col("id")).collect().toSeq)
    // same pushdown machinery as parquet: the predicate reaches the scan
    val plan = back.filter(col("id") > 90).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"),
      s"orc scan lost pushdown:\n$plan")
  }

  test("ExtraMapping <-> key/value table round-trip (io.py:231-242)") {
    val m = Map("us" -> "United States", "fr" -> "France")
    val df = GraftIO.mappingToDf(spark, m)
    assert(df.columns.toSeq == Seq("key", "value"))
    assert(GraftIO.dfToMapping(df) == m)
  }

  // ---- multi-file sources: the reference's per-file header semantics
  //      (io.py:34-60) applied to globs/dirs ----

  private def tmpDir(files: (String, String)*): java.nio.file.Path = {
    val dir = Files.createTempDirectory("graft_io_multi")
    files.foreach { case (n, c) => Files.writeString(dir.resolve(n), c) }
    dir
  }

  test("read_csv over a dir unions consistent files (headers checked per file)") {
    val dir = tmpDir(
      "a.csv" -> "name,age\nalice,30\nbob,40\n",
      "b.csv" -> "name,age\ncarol,50\n")
    val df = GraftIO.readCsv(spark, dir.toString)
    assert(df.columns.toSeq == Seq("name", "age"))
    assert(df.count() == 3)
  }

  test("read_csv over a glob applies the dup-header error to EVERY file") {
    val dir = tmpDir(
      "a.csv" -> "name,age\nalice,30\n",
      "b.csv" -> "name,name\nx,y\n")
    val e = intercept[DataException](GraftIO.readCsv(spark, s"$dir/*.csv"))
    assert(e.getMessage.contains("Duplicate header names"))
  }

  test("read_csv over a glob errors when files disagree on headers") {
    val dir = tmpDir(
      "a.csv" -> "name,age\nalice,30\n",
      "b.csv" -> "name,height\nx,180\n")
    val e = intercept[DataException](GraftIO.readCsv(spark, s"$dir/*.csv"))
    assert(e.getMessage.contains("disagree on headers"))
  }

  test("read_csv over a dir catches ragged rows in ANY file") {
    val dir = tmpDir(
      "a.csv" -> "a,b,c\n1,2,3\n",
      "b.csv" -> "a,b,c\n4,5\n")
    val e = intercept[DataException](GraftIO.readCsv(spark, dir.toString))
    assert(e.getMessage.contains("Fields missing"))
  }

  // ---- quote handling: parser (escape='"', RFC 4180) and ragged-row
  //      probe must agree on field counts ----

  test("read_csv RFC-4180 escaped quotes: parser and ragged probe agree") {
    val p = tmp("a,b\n\"say \"\"hi, there\"\"\",2\n")
    val df = GraftIO.readCsv(spark, p)
    assert(df.count() == 1)
    assert(df.head().getString(0) == "say \"hi, there\"")
  }

  test("read_csv unterminated quote: probe raises no spurious ragged error") {
    // '"oops,2' never closes its quote: the parser reads the rest of the
    // line into the first field and null-fills b; the probe counts the
    // line's raw delimiter (no quoted section collapses) and also sees
    // >= 2 fields — both engines accept the line, no DataException
    val p = tmp("a,b\n\"oops,2\nx,3\n")
    val df = GraftIO.readCsv(spark, p)
    assert(df.count() == 2)
    val byA = df.collect().map(r => Option(r.getString(0)).getOrElse("") -> r.getString(1)).toMap
    assert(byA.contains("x") && byA("x") == "3")
  }

  test("savePartitionedParquet: hive layout, scans prune on the partition column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/docs"
    val df = Seq((1L, "hello", "en"), (2L, "hallo", "de"), (3L, "bonjour", "fr"),
      (4L, "world", "en")).toDF("id", "text", "lang")
    GraftIO.savePartitionedParquet(df, dir, Seq("lang"))
    // hive directory layout
    val langDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(langDirs.toSeq == Seq("lang=de", "lang=en", "lang=fr"))
    // a filter on the partition column prunes at planning time
    val back = spark.read.parquet(dir).filter(org.apache.spark.sql.functions.col("lang") === "en")
    assert(back.count() == 2)
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"partition filter did not reach the scan:\n$scan")
    assertThrows[IllegalArgumentException](
      GraftIO.savePartitionedParquet(df, dir, Seq.empty))
  }
}
