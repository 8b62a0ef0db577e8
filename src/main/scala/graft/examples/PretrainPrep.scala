package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{CorpusOps, Dedup}

/** End-to-end pretraining-data preparation — the full corpus-curation
  * story composed from graft operators, one stage per real pipeline step:
  *
  *   1. quality gate:  token count + Gopher-style repetition caps
  *   2. dedup:         exact (fingerprint) then MinHash-LSH near-dup
  *   3. decontaminate: drop docs overlapping the benchmark shingle set
  *   4. mix:           rebalance sources to target weights (exact quotas)
  *   5. split:         deterministic train/val/test assignment
  *   6. pack:          concat-and-chunk token offsets per split
  *
  * Every stage is deterministic (md5-keyed, no RNG) and shuffle-bounded;
  * the only driver-side data are per-source counts (mix) and partition
  * offset arrays (pack). Sibling `Curation` is the Phase/Pipeline-framed
  * variant with the event-channel audit trail; this one is the plain
  * DataFrame-combinator form a library user would script.
  */
object PretrainPrep {

  final case class Config(
      minTokens: Int = 5,
      maxDup5gramFrac: Double = 0.5,
      maxTopBigramFrac: Double = 0.5,
      nearDupThreshold: Double = 0.8,
      contamNgram: Int = 3,
      weights: Map[String, Int] = Map.empty, // empty = keep all sources as-is
      shares: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5),
      packCapacity: Int = 2048)

  /** Returns the packed corpus: one row per surviving document with
    * (all input columns, n_tokens, split, start_offset, chunk_id) —
    * offsets are per-split (each split packs independently). */
  def run(docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, sourceCol: String, cfg: Config = Config()): DataFrame = {

    // 1. quality gate — pure projections + one id-keyed agg (repetition)
    val scored = CorpusOps.repetitionScores(docs, idCol, textCol)
      .withColumnRenamed("id", idCol)
      .join(docs, Seq(idCol))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
    val kept = scored.filter(
      col("n_tokens") >= cfg.minTokens &&
      col("dup_5gram_frac") <= cfg.maxDup5gramFrac &&
      col("top_bigram_frac") <= cfg.maxTopBigramFrac)

    // 2. dedup: exact, then near-dup (lowest id survives a pair)
    val exact = Dedup.exactDedup(kept, idCol, textCol)
    val pairs = Dedup.minhashLshPairs(exact, idCol, textCol,
      n = 3, threshold = cfg.nearDupThreshold)
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    val deduped = exact.join(broadcast(losers), Seq(idCol), "left_anti")

    // 3. decontaminate vs the (broadcast) benchmark shingle set
    val contaminated = CorpusOps.decontaminate(deduped, benchmark,
      idCol, textCol, n = cfg.contamNgram)
      .select(col("id").as(idCol))
    val clean = deduped.join(broadcast(contaminated), Seq(idCol), "left_anti")

    // 4. mix to target source weights (skip when no weights requested)
    val mixed =
      if (cfg.weights.isEmpty) clean
      else CorpusOps.mixToWeights(clean, sourceCol, idCol, cfg.weights)

    // 5. deterministic split, 6. pack each split independently
    val split = CorpusOps.hashSplit(mixed, idCol, cfg.shares)
    cfg.shares.map { case (name, _) =>
      CorpusOps.packSequences(
        split.filter(col("split") === name), idCol, "n_tokens",
        cfg.packCapacity)
    }.reduce(_ unionByName _)
  }
}
