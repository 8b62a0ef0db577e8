package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Stable 1-based row numbers (reference: records.py:63-92 — assigned on
  * construction, monotonically increasing, preserved across phases; diff
  * joins on them, table_diff.py:40).
  *
  * Implementation notes for scale:
  *  - Ingest numbering is `zipWithIndex` (one narrow extra pass, no
  *    shuffle, deterministic for a fixed source layout).
  *  - Appended rows get `max(existing) + rank` — the max() is one cheap
  *    action over a long column.
  *  - `renumber` re-sorts by the old numbers; it is the only globally
  *    ordered operation and phases using it are marked non-diffable
  *    (reference phase.py:330-331).
  */
object RowNum {
  import Events.RowNumCol

  /** Assign 1..n in current row order. No shuffle. zipWithIndex runs an
    * extra partition-count pass, so the input is cached first — otherwise
    * the whole upstream plan (scans, parses) executes twice. */
  def assign(df: DataFrame): DataFrame = {
    val withoutOld = df.drop(RowNumCol)
    val schema = withoutOld.schema.add(StructField(RowNumCol, LongType, nullable = false))
    // cache at the RDD level: zipWithIndex's partition-count pass would
    // otherwise run the whole upstream twice, and RDD-level caches are
    // auto-released by the ContextCleaner once unreferenced (a DataFrame
    // persist would pin the CacheManager entry forever)
    val input = withoutOld.rdd
    input.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rdd = input.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  def ensure(df: DataFrame): DataFrame =
    if (df.columns.contains(RowNumCol)) df else assign(df)

  /** Number rows of `appended` after the current max of `existing`
    * (reference phase.py:120-124: new rows numbered after current max). */
  def appendNumbered(existing: DataFrame, appended: DataFrame): DataFrame = {
    val maxNum = existing.agg(max(col(RowNumCol))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val numbered = assign(appended)
      .withColumn(RowNumCol, col(RowNumCol) + lit(maxNum))
    existing.unionByName(numbered)
  }

  /** Re-assign 1..n in the order of the current numbers (renumber=True
    * phases, records.py:79-81). Globally ordered by construction. */
  def renumber(df: DataFrame): DataFrame =
    assign(df.orderBy(col(RowNumCol)))
}
