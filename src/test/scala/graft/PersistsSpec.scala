package graft

import org.apache.spark.sql.functions._
import graft.plans.{Persists, RowNum}

/** No-leak invariant for two-pass operators: persisted blocks are scoped to
  * the first Dataset action on the operator's output
  * ([[Persists.releaseOnNextAction]]) instead of waiting for the
  * ContextCleaner — the round-2 driver bench measured one query's leaked
  * blocks billing the NEXT queries 2-15x (r4_renumber 0.37s -> 10.3s). */
class PersistsSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  /** Listener delivery is async (listener-bus thread) — poll briefly. */
  private def awaitNoLive(maxMs: Long = 15000): Unit = {
    val deadline = System.nanoTime() + maxMs * 1000000L
    while (Persists.livePersistedRdds(spark) > 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(Persists.livePersistedRdds(spark) === 0)
  }

  private def clean(): Unit = {
    Persists.releaseAll(spark) // baseline: earlier suites share this JVM/session
    assert(Persists.livePersistedRdds(spark) === 0)
  }

  test("RowNum.assign blocks are released by the first action on the frame") {
    clean()
    val df = spark.range(0, 10000).toDF("id").withColumn("x", col("id") * 2)
    val numbered = RowNum.assign(df)
    assert(Persists.livePersistedRdds(spark) === 1) // alive between the passes
    assert(numbered.count() === 10000L)
    awaitNoLive()
    // early release is correct: the frame still evaluates after the blocks
    // are gone (lineage recompute, same broadcast offsets)
    assert(numbered.count() === 10000L)
  }

  test("packSequences blocks are released by the first action on the output") {
    clean()
    val df = spark.range(0, 1000).toDF("doc_id").withColumn("n_tokens", lit(7))
    val packed = graft.operators.CorpusOps.packSequences(df, "doc_id", "n_tokens", 64)
    assert(packed.count() === 1000L)
    awaitNoLive()
  }

  test("every ranked gated query leaves no blocks after its action") {
    clean()
    for (name <- Seq("b3_sort_by", "r4_renumber", "x19_pack_sequences")) {
      SparkEntry.queries(name)(spark, sfDir).count()
      awaitNoLive()
    }
  }

  test("curation e1 query leaves no blocks after its action") {
    clean()
    SparkEntry.queries("e1_curation_pipeline")(spark, sfDir).count()
    awaitNoLive()
  }

  test("releaseAll drops persisted RDDs and cached relations immediately") {
    clean()
    val df = spark.range(0, 100).toDF("id").persist()
    df.count()
    spark.range(0, 50).toDF("i").cache().count()
    assert(Persists.livePersistedRdds(spark) >= 1)
    Persists.releaseAll(spark)
    assert(Persists.livePersistedRdds(spark) === 0)
  }
}
