package graft

import org.apache.spark.sql.functions._

import graft.operators.TableDiff
import graft.plans.{Events, RowNum}

/** Mirrors reference tests/test_table_diff.py classification cases. */
class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added/removed/changed/unchanged (table_diff.py:108-153)") {
    val f1 = RowNum.assign(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("name", "v"))
    // row 2 changed, row 3 removed, row 4 added
    val f2 = RowNum.assign(Seq(("a", 1), ("bb", 2), ("d", 4)).toDF("name", "v"))
      .withColumn(Events.RowNumCol,
        when(col(Events.RowNumCol) === 3, 4L).otherwise(col(Events.RowNumCol)))
    val d = TableDiff.diff(f1, f2)
    val c = TableDiff.counters(d)
    assert(c == TableDiff.Counters(added = 1, removed = 1, changed = 1, unchanged = 1))
  }

  test("diff handles column names containing dots (no struct-field misparse)") {
    val f1 = RowNum.assign(Seq(("a", 1.0), ("b", 2.0)).toDF("name", "price.usd"))
    val f2 = RowNum.assign(Seq(("a", 1.0), ("b", 3.0)).toDF("name", "price.usd"))
    val c = TableDiff.counters(TableDiff.diff(f1, f2))
    assert(c == TableDiff.Counters(added = 0, removed = 0, changed = 1, unchanged = 1))
  }

  test("column-rename alignment (D2, table_diff.py:77-89)") {
    val f1 = RowNum.assign(Seq(("a", 1)).toDF("oldname", "v"))
    val f2 = RowNum.assign(Seq(("a", 1)).toDF("newname", "v"))
    val d = TableDiff.diff(f1, f2, renames = Map("oldname" -> "newname"))
    assert(TableDiff.counters(d) == TableDiff.Counters(0, 0, 0, 1))
  }

  test("char-level diff markup (table_diff.py:155-164)") {
    val (o, n) = TableDiff.charDiff("kitten", "sitting")
    assert(o == "<del>k</del>itt<del>e</del>n")
    assert(n == "<ins>s</ins>itt<ins>i</ins>n<ins>g</ins>")
    // HTML escaping
    val (o2, n2) = TableDiff.charDiff("a<b", "a<c")
    assert(o2.contains("&lt;"))
  }

  test("html report renders counts and markup") {
    val f1 = RowNum.assign(Seq(("x", 1)).toDF("name", "v"))
    val f2 = RowNum.assign(Seq(("y", 1)).toDF("name", "v"))
    val html = TableDiff.htmlReport(TableDiff.diff(f1, f2))
    assert(html.contains("changed: 1"))
    assert(html.contains("<del>") || html.contains("<ins>"))
  }
}
