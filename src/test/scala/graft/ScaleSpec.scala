package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale
import graft.plans.Pipeline
import graft.sources.Format

/** Skew helpers + strict-checkpoint-compat mode. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // hot key: 90% of rows share key 'hot'
    val big = (1 to 1000).map(i =>
      (if (i % 10 == 0) s"k$i" else "hot", i.toLong)).toDF("key", "id")
    val small = Seq(("hot", "H"), ("k10", "A"), ("k20", "B")).toDF("key", "label")
    val plain = big.join(small, Seq("key")).select("key", "id", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Scale.saltedJoin(big, small, "key", discriminator = "id", salts = 8)
      .select("key", "id", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.size == 1000 - 100 + 2) // 900 hot + k10 + k20
  }

  test("saltedJoin keeps rows whose discriminator is null") {
    val big = Seq((Some("hot"), Option.empty[String]), (Some("hot"), Some("r1")))
      .map { case (k, d) => (k.orNull, d.orNull) }.toDF("key", "rid")
    val small = Seq(("hot", "H")).toDF("key", "label")
    val out = Scale.saltedJoin(big, small, "key", discriminator = "rid", salts = 4)
    assert(out.count() == 2) // null-rid row joined too (salt 0, not null)
    assertThrows[IllegalArgumentException](
      Scale.saltedJoin(big, small, "key", "rid", 4, joinType = "full_outer"))
  }

  test("saltedCount equals plain groupBy count") {
    val df = (1 to 500).map(i => (if (i % 5 == 0) "rare" else "hot", i.toLong))
      .toDF("key", "id")
    val plain = df.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedCount(df, "key", "id", salts = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("distinctCountPerKey equals countDistinct, and never plans an Expand") {
    val df = (1 to 2000).map(i => (s"t${i % 3}", (i % 37).toLong)).toDF("key", "uid")
    val plain = df.groupBy("key").agg(countDistinct(col("uid")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val staged = Scale.distinctCountPerKey(df, "key", "uid", as = "n")
    assert(staged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == plain)
    // the point of the two-stage plan: dedup keyed on (key, value) via
    // HashAggregate, no single-reducer distinct state
    val plan = staged.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"two-stage distinct planned an Expand:\n$plan")
  }

  test("distinctCountPerKey ignores null values, like COUNT(DISTINCT)") {
    // the distinct() stage keeps one (key, null) row per key — it must
    // contribute 0, including the all-null group
    val df = Seq(("a", Some(1L)), ("a", Some(1L)), ("a", None),
      ("b", None), ("b", None)).toDF("key", "uid")
    val got = Scale.distinctCountPerKey(df, "key", "uid", as = "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 0L))
  }

  test("bucketed tables join with no shuffle exchange on either side") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Scale.bucketedWrite(orders, "b_orders", "o_orderkey", 4)
    Scale.bucketedWrite(lineitem, "b_lineitem", "o_orderkey", 4)
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem").hint("merge"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join, got:\n$plan")
    // and it's still the right answer
    assert(joined.count() ==
      orders.join(lineitem, Seq("o_orderkey")).count())
  }

  test("strictCheckpointCompat re-reads checkpoints (types re-stringified, like the reference)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_strict").toString
    val src = java.nio.file.Paths.get(dir, "in.csv")
    java.nio.file.Files.writeString(src, "n,s\n1,a\n2,b\n")
    val p1 = graft.plans.Phase("One",
      columns = Seq(graft.functions.ColumnDef.int("n")))
    // phase Two sees the CSV-re-read frame: n is a STRING again
    var observedType: Option[org.apache.spark.sql.types.DataType] = None
    val p2 = graft.plans.Phase("Two", steps = Seq(
      graft.plans.Step.context("observe") { (df, _) =>
        observedType = Some(df.schema("n").dataType)
      }))
    val pipe = new Pipeline(spark, Seq(p1, p2),
      java.nio.file.Paths.get(dir, "out").toString, src.toString,
      saveFormat = Format.Csv, strictCheckpointCompat = true)
    pipe.run()
    assert(observedType.contains(org.apache.spark.sql.types.StringType))

    // default mode: phase Two sees the typed in-memory frame
    var observedType2: Option[org.apache.spark.sql.types.DataType] = None
    val p2b = graft.plans.Phase("Two", steps = Seq(
      graft.plans.Step.context("observe") { (df, _) =>
        observedType2 = Some(df.schema("n").dataType)
      }))
    val pipe2 = new Pipeline(spark, Seq(p1, p2b),
      java.nio.file.Paths.get(dir, "out2").toString, src.toString,
      saveFormat = Format.Csv)
    pipe2.run()
    assert(observedType2.contains(org.apache.spark.sql.types.LongType))
  }
}
