package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.plans.Pipeline
import graft.sources.Format

/** The curation example end-to-end over the driver's documents table. */
class CurationSpec extends SparkSpec {

  test("curation pipeline: analyze -> filter -> exact+near dedup") {
    val dir = Files.createTempDirectory("graft_curation").toString
    val src = "/root/testdata/sf0.001/documents.parquet"
    val pipeline = new Pipeline(spark, graft.examples.Curation.phases,
      Paths.get(dir, "out").toString, src,
      name = "curation", saveFormat = Format.Parquet)
    val result = pipeline.run()

    val inDocs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val nIn = inDocs.count()
    val nOut = result.count()
    assert(nOut > 0 && nOut <= nIn)

    // metrics columns present and populated
    assert(result.columns.toSet.intersect(
      Set("lang_pred", "n_tokens", "quality", "fp")).size == 4)
    assert(result.filter(col("quality") < 0.2).isEmpty)
    assert(result.filter(col("n_tokens") < 5).isEmpty)

    // near-dups removed: no surviving pair at the dedup threshold
    val residual = Dedup.minhashLshPairs(result, "doc_id", "text", 3, 0.8)
    assert(residual.isEmpty, "near-dup pairs survived dedup")

    // the planted near-dups at sf0.001 imply the output shrank
    val expectedLosers = Dedup.minhashLshPairs(inDocs, "doc_id", "text", 3, 0.8)
      .select("id_b").distinct().count()
    assert(nOut <= nIn - expectedLosers)

    // checkpoints exist for every phase
    for (p <- Seq("Analyze", "Filter", "Dedup"))
      assert(Files.exists(Paths.get(dir, "out", s"${p}_output.parquet")), s"missing $p")
  }
}
