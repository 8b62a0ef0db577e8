package graft

import org.apache.spark.sql.functions._

import graft.examples.PretrainPrep

/** End-to-end pretraining-prep composition: quality gate -> dedup ->
  * decontaminate -> mix -> split -> pack, on the sf0.001 documents. */
class PretrainPrepSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("pretrain prep: filters, dedups, decontaminates, splits, and packs deterministically") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val benchmark = docs.filter(col("doc_id") < 10).select(col("text"))
    val corpus = docs.filter(col("doc_id") >= 10)

    val out = PretrainPrep.run(corpus, benchmark, "doc_id", "text", "source")
      .cache()
    val n = out.count()
    assert(n > 0 && n < 490) // something survived, something was dropped

    // near-dups removed: no surviving pair above the threshold
    val survivorPairs = graft.operators.Dedup.ngramJaccardPairs(
      out.select(col("doc_id"), col("text")), "doc_id", "text",
      n = 3, threshold = 0.8)
    assert(survivorPairs.isEmpty)

    // decontaminated: no surviving doc shares a 3-gram with the benchmark
    val contam = graft.operators.CorpusOps.decontaminate(
      out.select(col("doc_id"), col("text")), benchmark, "doc_id", "text", n = 3)
    assert(contam.isEmpty)

    // split covers every row; packing is per-split with exclusive offsets
    assert(out.filter(col("split").isNull).isEmpty)
    val perSplit = out.groupBy("split").agg(
      sum("n_tokens").as("tok"), max(col("start_offset") + col("n_tokens")).as("end"))
    perSplit.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"split ${r.getString(0)}: offsets must cover tokens exactly")
    }

    // deterministic: a rerun yields the identical frame
    val out2 = PretrainPrep.run(corpus, benchmark, "doc_id", "text", "source")
    assert(out.exceptAll(out2).isEmpty && out2.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("pretrain prep with mixing hits the requested source ratio") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val benchmark = docs.filter(col("doc_id") < 10).select(col("text"))
    val corpus = docs.filter(col("doc_id") >= 10)
    val cfg = PretrainPrep.Config(
      weights = Map("src4" -> 2, "src5" -> 1),
      shares = Seq("train" -> 100)) // single split keeps the ratio check exact
    val out = PretrainPrep.run(corpus, benchmark, "doc_id", "text", "source", cfg)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet == Set("src4", "src5"))
    // integer quotas: src4 count = 2 * floor(N/3), src5 = floor(N/3)
    assert(bySrc("src4") == 2 * bySrc("src5") ||
      (bySrc("src4") - 2 * bySrc("src5")).abs <= 1) // floor slack from w*N/W
  }
}
