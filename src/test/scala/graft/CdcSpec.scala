package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("mergeUpsert applies I/U/D; U on a missing key inserts (upsert); D on a missing key is a no-op") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "price")
    val changes = Seq(
      (2L, "U", "b2", 25.0),  // update existing
      (3L, "D", "c", 30.0),   // delete existing
      (4L, "I", "d", 40.0),   // insert new
      (5L, "U", "e", 50.0),   // update-on-missing -> upsert
      (9L, "D", "z", 0.0)     // delete-on-missing -> no-op
    ).toDF("k", "op", "name", "price")
    val out = Cdc.mergeUpsert(snap, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(
      (1L, "a", 10.0), (2L, "b2", 25.0), (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("scd2Intervals chains valid_from/valid_to per key with deterministic tie order") {
    val log = Seq(
      (1L, 100L, 10L), (1L, 100L, 11L), (1L, 200L, 12L), // tie at ts=100 ordered by id
      (2L, 50L, 20L)
    ).toDF("k", "ts", "id")
    val out = Cdc.scd2Intervals(log, "k", "ts", tieCols = Seq("id"))
      .select("k", "id", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, 10L, 100L, Some(100L), false),
      (1L, 11L, 100L, Some(200L), false),
      (1L, 12L, 200L, None, true),
      (2L, 20L, 50L, None, true)))
  }

  test("corpusDiff: added/removed/changed/unchanged; formatting-only edits are unchanged") {
    val old = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept as is"),
      (4L, "will vanish")).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "alpha beta"),            // unchanged
      (2L, "gamma delta REVISED"),   // changed
      (3L, "  Kept   AS  is  "),     // formatting-only: fingerprint equal
      (5L, "brand new doc")          // added
      // 4 absent -> removed
    ).toDF("doc_id", "text")
    val out = Cdc.corpusDiff(old, neu, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L,
      "unchanged" -> 2L))
  }
}
