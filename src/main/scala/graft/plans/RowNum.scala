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

  /** Assign 1..n in current row order. Numbering is inherently two passes
    * (per-partition offsets need every partition's count before any row can
    * be numbered), so the input RDD is persisted MEMORY_AND_DISK_SER around
    * them: the count pass executes the upstream ONCE and materializes it;
    * the numbering pass reads the stored partitions instead of recomputing
    * (zipWithIndex would re-execute the whole upstream for its count job).
    * The blocks are scoped to the FIRST Dataset action on the returned
    * frame ([[Persists.releaseOnNextAction]]) — deterministic release, not
    * ContextCleaner-when-GC'd (which leaked blocks across a 50-query bench
    * session, billing one query's storage to the next). MEMORY_AND_DISK
    * spills rather than OOMing at scale. Count and numbering run on the
    * SAME RDD instance — a separately-built (e.g. column-pruned) plan can
    * partition/order rows differently, which would scramble the offsets. */
  def assign(df: DataFrame): DataFrame = {
    val (numbered, persisted) = assignImpl(df)
    Persists.releaseOnNextAction(df.sparkSession, persisted)
    numbered
  }

  private def assignImpl(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[Row]) = {
    val withoutOld = df.drop(RowNumCol)
    val schema = withoutOld.schema.add(StructField(RowNumCol, LongType, nullable = false))
    val rdd0 = withoutOld.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val counts = rdd0
      // fold into a Long: Iterator.size returns Int and a >2^31-row
      // partition would overflow negative, scrambling every later offset
      .mapPartitionsWithIndex((pid, it) =>
        Iterator(pid -> it.foldLeft(0L)((n, _) => n + 1)))
      .collect().toMap
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    val offsets = (0 to maxPid).scanLeft(0L)((acc, pid) => acc + counts.getOrElse(pid, 0L))
    val bc = df.sparkSession.sparkContext.broadcast(offsets.toArray)
    val rdd = rdd0.mapPartitionsWithIndex { case (pid, it) =>
      var n = if (pid < bc.value.length) bc.value(pid) else 0L
      it.map { row => n += 1; Row.fromSeq(row.toSeq :+ n) }
    }
    (df.sparkSession.createDataFrame(rdd, schema), rdd0)
  }

  def ensure(df: DataFrame): DataFrame =
    if (df.columns.contains(RowNumCol)) df else assign(df)

  /** Eager-consumer variant: number, run `f`, then DROP the persisted
    * blocks deterministically (assign's persist is otherwise reclaimed
    * only when the ContextCleaner GCs the frame's lineage — fine for
    * short-lived query frames, wasteful when the caller fully consumes
    * the numbered frame inside one action, e.g. a collect). */
  def withAssigned[T](df: DataFrame)(f: DataFrame => T): T = {
    val (numbered, persisted) = assignImpl(df)
    try f(numbered)
    finally persisted.unpersist(false)
  }

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
