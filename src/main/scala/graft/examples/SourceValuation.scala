package graft.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.CorpusOps

/** END-TO-END source valuation scorecard — the per-source brief a data
  * team brings to a licensing/mixture meeting, composed from the
  * engine's gated valuation stages:
  *
  *  1. marginal value: [[CorpusOps.looInfluence]] — what happens to the
  *     corpus mean if this source is dropped (the full-coalition
  *     margin);
  *  2. coalition value: [[CorpusOps.shapleyCoverage]] — exact Shapley
  *     credit under the shingle-coverage utility (what unique content
  *     the source actually buys, however the rest of the mix shifts);
  *  3. tail value: [[CorpusOps.tailOwnership]] — the source's share of
  *     the corpus's extreme-length documents (concentration the mean
  *     cannot see);
  *  4. efficiency: [[CorpusOps.paretoFront]] — whether any other
  *     source strictly dominates it on (volume, mean length).
  *
  * Output one row per source: (source, n_docs, mean_len, influence,
  * shapley, n_exclusive, share_p90, on_front, value_rank) with
  * value_rank = position by Shapley credit (ties by name) — the
  * shortlist order. Deterministic end to end (microgrid Shapley terms,
  * integer-exact thresholds, round-6 convention), so the whole
  * scorecard replays as one SQL statement.
  *
  * 100 TB shape: each stage is its own documented reduction of the
  * corpus scan (the Shapley stage's shingle shuffle dominates; the
  * rest are per-source partial aggs); the assembly only equi-joins
  * BROADCAST source-bounded frames — nothing after the stages touches
  * corpus-sized data. */
object SourceValuation {

  def run(docs: DataFrame, sourceCol: String, textCol: String,
      valueCol: String): DataFrame = {
    val loo = CorpusOps.looInfluence(docs, sourceCol, valueCol)
    val shap = CorpusOps.shapleyCoverage(docs, sourceCol, textCol, n = 3)
    val tail = CorpusOps.tailOwnership(docs, sourceCol, valueCol)
    val front = CorpusOps.paretoFront(docs, sourceCol, valueCol)
    val rankW = Window.orderBy(col("shapley").desc, col(sourceCol).asc)
    loo
      .join(broadcast(shap), Seq(sourceCol))
      .join(broadcast(tail.select(col(sourceCol), col("share_p90"))),
        Seq(sourceCol))
      .join(broadcast(front.select(col(sourceCol), col("on_front"))),
        Seq(sourceCol))
      .select(col(sourceCol), col("n").as("n_docs"),
        col("mean_in").as("mean_len"), col("influence"),
        col("shapley"), col("n_exclusive"), col("share_p90"),
        col("on_front"))
      // the rank window orders the SOURCE-bounded scorecard frame, not
      // corpus rows
      .withColumn("value_rank", row_number().over(rankW).cast(LongType))
      .orderBy(col("value_rank"))
  }
}
