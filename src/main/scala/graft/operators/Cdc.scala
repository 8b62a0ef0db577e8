package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: applying a change batch to a snapshot
  * (the Delta/Iceberg MERGE INTO shape) and building validity-interval
  * history from an ordered change log (SCD type 2). The reference's diff
  * machinery (table_diff.py) DETECTS changes between checkpoints; these
  * APPLY and HISTORIZE them — the other half of the CDC story a
  * warehouse-scale pipeline needs.
  *
  * Scale shapes:
  *  - [[mergeUpsert]] is ONE equi full-outer shuffle join on the merge key
  *    (both sides hash-partition; full-outer cannot broadcast, and at CDC
  *    scale the snapshot side dominates anyway) + a narrow projection.
  *    No window, no driver state.
  *  - [[scd2Intervals]] is one keyed window (partitioned by the business
  *    key) — never a global sort.
  */
object Cdc {

  /** Apply a change batch to a snapshot. `changes` carries the same
    * columns as `snapshot` plus `opCol` with values I (insert), U
    * (update: non-key columns replaced wholesale), D (delete). Unmatched
    * snapshot rows pass through; an I/U on an existing/missing key is
    * treated as upsert either way (like MERGE ... WHEN [NOT] MATCHED).
    */
  def mergeUpsert(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String = "op"): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == keyCol).toSeq
    require(dataCols.forall(changes.columns.contains),
      s"changes must carry the snapshot's columns; missing " +
        dataCols.filterNot(changes.columns.contains).mkString(","))
    val s = snapshot.select(col(keyCol) +:
      dataCols.map(c => col(c).as(s"__s_$c")): _*)
    val c = changes.select(col(keyCol) +: col(opCol).as("__op") +:
      dataCols.map(c2 => col(c2).as(s"__c_$c2")): _*)
    s.join(c, Seq(keyCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(keyCol) +: dataCols.map(c2 =>
        when(col("__op").isin("I", "U"), col(s"__c_$c2"))
          .otherwise(col(s"__s_$c2")).as(c2)): _*)
  }

  /** SCD2 validity intervals from an ordered change log: one row per log
    * entry with `valid_from` = its timestamp and `valid_to` = the key's
    * NEXT timestamp (null = current version). `tieCols` complete the
    * per-key ordering so same-timestamp entries historize
    * deterministically. */
  def scd2Intervals(log: DataFrame, keyCol: String, tsCol: String,
      tieCols: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    log
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Corpus snapshot diff — the refresh-audit report between two corpus
    * versions: how many documents were added, removed, changed (same id,
    * different normalized content), or unchanged. The number every
    * scheduled re-crawl / re-curation run publishes before the new
    * snapshot is accepted; TableDiff answers this for row-numbered
    * pipeline checkpoints, this answers it for id-keyed corpora where
    * content equality means fingerprint equality
    * ([[graft.functions.TextFunctions.fingerprint]] — whitespace-
    * normalized lowercase md5, the x1 dedup key, so "changed" ignores
    * formatting-only edits).
    *
    * Scale shape: two narrow fingerprint scans (the texts themselves
    * never move — only (id, fp) rows shuffle), ONE equi full-outer join
    * on id, a narrow status CASE, and a partial-agged count over 4 keys.
    * Output: (status, n) — at most 4 rows. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val fp = graft.functions.TextFunctions.fingerprint _
    val o = oldDf.select(col(idCol).as("id"), fp(col(textCol)).as("fp_old"))
    val n = newDf.select(col(idCol).as("id"), fp(col(textCol)).as("fp_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(when(col("fp_old").isNull, "added")
        .when(col("fp_new").isNull, "removed")
        .when(col("fp_old") === col("fp_new"), "unchanged")
        .otherwise("changed").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
  }
}
