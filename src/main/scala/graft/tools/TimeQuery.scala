package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Dev harness: time ONE SparkEntry query in isolation.
  *
  *   runMain graft.tools.TimeQuery <name> [sfDir] [reps]
  *
  * Prints per-rep wall time and the formatted physical plan, so a slow
  * query can be separated into plan problems (wrong join, missing
  * pushdown) vs eval problems (codegen fallback — run with
  * SPARK_GRAFT_LOG=INFO and grep for janino/`Codegen` warnings).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName> [sfDir] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      graft.plans.Persists.releaseAll(spark)
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
