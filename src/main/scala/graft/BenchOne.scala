package graft
import org.apache.spark.sql.SparkSession

/** Focused bench/plan harness: time ONE SparkEntry query (same session
  * shape as [[Bench]]) and optionally dump its formatted plan —
  * `runMain graft.BenchOne <name> [sfDir]`, env SPARK_GRAFT_EXPLAIN=1
  * for the plan, SPARK_GRAFT_BENCH_REPS for reps (default 3, min
  * reported). Exists so a single query's regression can be bisected
  * without paying a full Bench sweep per hypothesis.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <queryName> [sfDir]")
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    // SPARK_GRAFT_CONF="k=v;k=v" — ad-hoc session-conf overrides for
    // bisection runs (e.g. spark.sql.adaptive.enabled=false to test
    // whether a bimodal timing is an AQE plan flip)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // session warmup
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.plans.Persists.releaseAll(spark)
      dt
    }
    println(f"[benchone] $name min=${times.min}%.3f s (all: ${times.map(t => f"$t%.3f").mkString(", ")})")
    spark.stop()
  }
}
