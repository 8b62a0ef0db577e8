package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.{ColType, ColumnDef}
import graft.plans._
import graft.sources.Format

/** Port of the reference's phase-to-phase output piping e2e
  * (tests/pipelines/families.py + tests/test_pipe_outputs_to_inputs.py):
  * phase 1 aggregates sibling counts into a named extra OUTPUT, phase 2
  * consumes the same name as an extra SOURCE (Context resolves outputs as
  * sources, context.py:107-125). */
class FamiliesSpec extends SparkSpec {

  private val countParents = Phase(
    name = "CountParents",
    columns = Seq(
      ColumnDef("id", ColType.IntT),
      ColumnDef("name"),
      ColumnDef("parent_id", ColType.IntT)),
    steps = Seq(
      Step.context("increment_counts") { (df, ctx) =>
        ctx.setOutput("sibling_counts",
          df.groupBy(col("parent_id").cast("string").as("key"))
            .agg(count(lit(1)).cast("string").as("value")))
      }),
    extraOutputs = Seq("sibling_counts"))

  private val enrichSiblings = Phase(
    name = "EnrichSiblings",
    columns = Seq(
      ColumnDef("id", ColType.IntT),
      ColumnDef("name"),
      ColumnDef("parent_id", ColType.IntT),
      ColumnDef("siblings", ColType.IntT, required = false)),
    steps = Seq(
      Step.batch("merge_counts") { (df, ctx) =>
        val counts = ctx.getSource("sibling_counts")
          .select(col("key").cast("long").as("parent_id"),
            (col("value").cast("long") - 1).as("siblings"))
        df.drop("siblings").join(broadcast(counts), Seq("parent_id"), "left")
      }),
    extraSources = Seq("sibling_counts"))

  test("phase 1 extra output feeds phase 2 extra source (families e2e)") {
    val dir = Files.createTempDirectory("graft_families").toString
    val src = Paths.get(dir, "families.csv")
    Files.writeString(src,
      """id,name,parent_id
        |1,kid_a,100
        |2,kid_b,100
        |3,kid_c,100
        |4,only,200
        |""".stripMargin)
    val pipeline = new Pipeline(spark, Seq(countParents, enrichSiblings),
      Paths.get(dir, "out").toString, src.toString,
      name = "PipePipeline", saveFormat = Format.Csv)
    val result = pipeline.run()
    val got = result.orderBy("id").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Long]("siblings")).toSeq
    assert(got == Seq("kid_a" -> 2L, "kid_b" -> 2L, "kid_c" -> 2L, "only" -> 0L))
    // the piped mapping was also checkpointed as a side table
    assert(Files.exists(Paths.get(dir, "out", "sibling_counts.csv")))
  }
}
