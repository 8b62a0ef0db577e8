package graft.plans

import org.apache.spark.sql.SparkSession

/** Deterministic persist lifecycle.
  *
  * Two-pass operators ([[RowNum.assign]],
  * [[graft.operators.CorpusOps.packSequences]]) persist their input RDD so
  * the upstream executes once; the blocks stay useful until the FIRST
  * downstream action consumes the returned frame, which happens outside the
  * operator (a query harness's write/count). Left alone they are reclaimed
  * only when the ContextCleaner GCs the lineage — across a 50-query bench
  * session that is a storage/GC leak that bills one query's blocks to the
  * next (measured: r4_renumber 0.37s -> 10.3s in the round-2 driver bench
  * with an otherwise better plan).
  *
  * Callers that fully consume a frame inside one scope should use
  * [[RowNum.withAssigned]]; harnesses that run query after query call
  * [[releaseAll]] between queries — the query's action has completed, so
  * every surviving block is dead weight by construction.
  */
object Persists {

  /** Drop every persisted RDD and cached relation in the session.
    * Non-blocking: removal is async, but the blocks are immediately
    * ineligible as live storage and the next query starts clean. */
  def releaseAll(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }

  /** Number of persisted RDDs currently alive — spec hook for the
    * no-leak invariant. */
  def livePersistedRdds(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size
}
