package graft.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.operators.Similarity

/** Nightly VECTOR-INDEX maintenance — the embedding-side sibling of
  * [[IncrementalIngest]] (documents) on the x63/x65 build/serve split:
  * a standing IVF bucket index absorbs a batch of new/re-embedded
  * vectors and the operator emits the per-bucket health report an index
  * operator actually pages through before swapping the index in.
  *
  * Pipeline: (1) the standing index is the persisted artifact — here
  * built from the standing slice with the same codegen'd sign-pattern
  * [[Similarity.ivfAssign]] the serve path probes; (2) the batch is
  * UPSERTED ([[Similarity.ivfIndexUpsert]] — only the batch is scored,
  * incoming ids replace standing rows, and because assignment is a pure
  * function of the vector the merged index is row-identical to a full
  * rebuild, which is exactly what the e9 oracle replays); (3) the
  * report joins before/after/incoming counts per bucket and flags hot
  * lists (n_after · numCentroids > 2 · total — the integer form of
  * "twice the mean", the x142 imbalance signal that predicts probe tail
  * latency).
  *
  * 100 TB shape: one narrow scan of the batch for assignment, one
  * key-only anti-join against the standing index, two partial-agged
  * groupBys on the ≤ numCentroids bucket key, window sums over a
  * ≤ numCentroids-row frame. The standing CORPUS is never re-scored.
  * Output: (bucket, n_before, n_after, n_new, hot), one row per
  * non-empty bucket. */
object VectorIndexMaintenance {

  def run(standing: DataFrame, incoming: DataFrame, idCol: String,
      vecCol: String, numCentroids: Int = 16, dims: Int = 64): DataFrame = {
    val toD: Column => Column = v => transform(v, x => x.cast(DoubleType))
    val index = standing.select(col(idCol),
      Similarity.ivfAssign(toD(col(vecCol)), numCentroids, dims).as("bucket"))
    val merged = Similarity.ivfIndexUpsert(index, incoming, idCol, vecCol,
      numCentroids, dims)
    val before = index.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_before"))
    val after = merged.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_after"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
    // ≤ numCentroids rows from here down: the unpartitioned frame is bounded
    val wAll = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    after.join(before, Seq("bucket"), "left")
      .withColumn("tot_after", sum(col("n_after")).over(wAll))
      .select(col("bucket").cast(LongType).as("bucket"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        col("n_after"), col("n_new"),
        (col("n_after") * numCentroids > col("tot_after") * 2L).as("hot"))
  }
}
