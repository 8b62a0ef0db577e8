package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions
import graft.operators.{ConnectedComponents, Dedup}

/** End-to-end NIGHTLY-INGEST curation: given a new `batch` and the
  * `history` snapshot it must not duplicate, emit the batch survivors —
  * the composition a production corpus actually runs every day, as
  * opposed to [[Curation]]'s one-shot whole-corpus pass.
  *
  * Stage order is the cost order of a 100 TB snapshot + small batch:
  *  1. quality gate — narrow filter, drops rows before anything shuffles;
  *  2. exact dedup, in-batch + vs history — the history side is its
  *     distinct fingerprint INDEX (one narrow column), never the corpus;
  *  3. near-dup vs history — the batch is banded AGAINST the snapshot
  *     ([[Dedup.minhashLshPairsAgainst]]); the snapshot never self-joins;
  *  4. in-batch near-dup clusters — pair graph -> transitive closure
  *     ([[ConnectedComponents]]), keep each cluster's min id (pairwise
  *     keep-min under-deletes chains: {A~B, B~C} must leave ONE doc).
  *
  * Loser sets are collected/broadcast — bounded by near-dup density of
  * the BATCH (not snapshot size), the same bound the anti-join broadcast
  * needs anyway. The narrow (doc_id, text) projection is persisted
  * around the pair walks and released deterministically (the Curation
  * lesson: persist the slim frame, never the wide one).
  *
  * Driver gate: e2 replays every stage in SQL (fingerprint rule, exact
  * jaccard cross + self pairs, recursive-CTE closure) — the whole
  * pipeline is result-proven against the naive rules, at sf0.01 and
  * sf0.1.
  */
object IncrementalIngest {

  def run(batch: DataFrame, history: DataFrame,
      minTokens: Int = 8, threshold: Double = 0.8): DataFrame = {
    val spark = batch.sparkSession

    // 1. quality gate (narrow, first)
    val q = batch.filter(TextFunctions.tokenCount(col("text")) >= minTokens)

    // 2. exact dedup: in-batch lowest-id-per-fingerprint, minus history fps
    val exact = Dedup.dedupAgainstHistory(q, history, "doc_id", "text")

    val slim = exact.select(col("doc_id"), col("text"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    try {
      import spark.implicits._
      val histSlim = history.select(col("doc_id"), col("text"))

      // 3. near-dup vs history: batch docs similar to ANY snapshot doc
      // drop. Loser ids are collected EAGERLY (bounded by batch near-dup
      // density — the same bound the broadcast anti-join needs anyway);
      // a lazy loser plan would re-run the pair search at every reuse.
      val crossLosers = spark.createDataset(
        Dedup.minhashLshPairsAgainst(
            slim, histSlim, "doc_id", "text", threshold = threshold)
          .select(col("id_a")).distinct().collect().map(_.getLong(0)).toSeq)
        .toDF("doc_id")
      val noHist = slim.join(broadcast(crossLosers), Seq("doc_id"), "left_anti")

      // 4. in-batch clusters: closure over the pair graph, keep component min
      val pairs = Dedup.minhashLshPairs(noHist, "doc_id", "text",
        threshold = threshold)
      val clusterLosers = spark.createDataset(
        ConnectedComponents.labels(pairs, "id_a", "id_b")
          .filter(col("id") =!= col("component"))
          .select(col("id")).collect().map(_.getLong(0)).toSeq)
        .toDF("doc_id")

      exact
        .join(broadcast(crossLosers), Seq("doc_id"), "left_anti")
        .join(broadcast(clusterLosers), Seq("doc_id"), "left_anti")
    } finally slim.unpersist(blocking = false)
  }
}
