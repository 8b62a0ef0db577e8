package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query at SPARK_GRAFT_SF_DIR, one JSON
  * line to stdout AND to a file (SPARK_GRAFT_BENCH_OUT, default
  * bench_result.json — a stdout scrape can be defeated by sbt's [info]
  * prefix; the file cannot).
  *
  * Self-defense against cross-query contamination: each query runs
  * SPARK_GRAFT_BENCH_REPS times (default 3) and reports the MIN, and after
  * every rep all persisted RDDs and cached relations are dropped
  * ([[graft.plans.Persists.releaseAll]]) — two-pass operators persist their
  * input around the numbering passes, and without the release one query's
  * blocks bill the next query's time (the round-2 driver bench measured a
  * contiguous 2-15x bulge from exactly this).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/classloading so the first timed query isn't charged
    // for session startup
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    graft.plans.Persists.releaseAll(spark)
    // A failed rep must never masquerade as a fast time (round-4 incident:
    // analysis errors were swallowed and 17 broken queries "ran" in 0.05 s).
    // Failed queries are excluded from `queries`/total, reported under
    // `errors`, and fail the whole run's exit code.
    // SPARK_GRAFT_BENCH_ONLY=q1,q2,... restricts the sweep (builder-side
    // bisection aid — an in-sweep slowdown that vanishes solo needs the
    // exact query prefix to reproduce; the driver never sets this)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val raw = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          err = Some((e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("")).replaceAll("\\s+", " ").take(300))
        }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.plans.Persists.releaseAll(spark)
        dt
      }
      System.gc() // broadcast/driver-heap hygiene between queries
      (name, times.min, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val ok = raw.collect { case (n, t, None) => n -> t }
    val errors = raw.collect { case (n, _, Some(e)) => n -> e }
    errors.foreach { case (n, e) => System.err.println(s"[bench] FAILED $n: $e") }
    val qs = ok.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"failed":${errors.size},"sf":"$sfDir"}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
