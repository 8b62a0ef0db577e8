package graft.cli

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.plans.{ErrorPolicy, Phase, Pipeline}
import graft.sources.Format

/** CLI (reference: phaser/cli/main.py + commands/run.py,diff.py,describe.py).
  *
  *   run <pipeline> <workdir> <source> [--error-policy P] [--format F]
  *   describe <pipeline>
  *   diff <workdir> <file1> <file2> [--out report.html]
  *
  * Pipelines are looked up in [[Registry]] by name (the reference discovers
  * the unique Pipeline subclass in `pipelines.<name>`; a registry is the
  * JVM-idiomatic equivalent — spark-submit-able).
  */
object Main {

  object Registry {
    val pipelines: Map[String, Seq[Phase]] = Map(
      "employees" -> graft.examples.Employees.phases,
      "employees_enrich" -> graft.examples.EmployeesEnrich.phases,
      "curation" -> graft.examples.Curation.phases)
    def apply(name: String): Seq[Phase] =
      pipelines.getOrElse(name,
        sys.error(s"Unknown pipeline '$name'; known: ${pipelines.keys.mkString(", ")}"))
  }

  private def session(): SparkSession = {
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "run" :: pipelineName :: workDir :: source :: rest =>
      val opts = parseOpts(rest)
      val policy = opts.get("error-policy").map(ErrorPolicy.fromName)
        .getOrElse(ErrorPolicy.Collect)
      val format = opts.get("format").map {
        case "csv" => Format.Csv
        case "json" => Format.JsonRecord
        case "parquet" => Format.Parquet
        case other => sys.error(
          s"Unknown --format '$other'; supported: csv, json, parquet")
      }.getOrElse(Format.Csv)
      // any other --<name> <path> flag is an extra-source init (the
      // reference's incremental args for uninitialized extra sources,
      // cli/main.py:119-123)
      val known = Set("error-policy", "format", "strict")
      val extraSources = opts.filterNot { case (k, _) => known.contains(k) }
      val spark = session()
      val pipeline = new Pipeline(spark, Registry(pipelineName), workDir, source,
        name = pipelineName, saveFormat = format, errorPolicy = policy,
        extraSourcePaths = extraSources,
        strictCheckpointCompat = opts.get("strict").contains("true"))
      val out = pipeline.run()
      println(s"[graft] pipeline $pipelineName finished: ${out.count()} rows, " +
        s"checkpoints in $workDir")

    case "describe" :: pipelineName :: Nil =>
      Registry(pipelineName).foreach { phase =>
        println(s"phase ${phase.name}" + (if (phase.renumber) " (renumber)" else ""))
        phase.columns.foreach(c => println(
          s"  column ${c.name}: ${c.colType.sparkType.simpleString}" +
            (if (!c.required) " optional" else "") +
            (if (!c.save) " unsaved" else "")))
        phase.steps.foreach(s => println(s"  step ${s.name}"))
      }

    case "diff" :: rest =>
      graft.operators.TableDiffCli.main(rest.toArray)

    case _ =>
      System.err.println(
        """usage: graft run <pipeline> <workdir> <source> [--error-policy warn|collect|drop_row|stop_now] [--format csv|json|parquet] [--strict true]
          |       graft describe <pipeline>
          |       graft diff <workdir> <file1> <file2> [--out report.html]""".stripMargin)
      sys.exit(2)
  }

  private def parseOpts(args: List[String]): Map[String, String] = {
    @annotation.tailrec
    def go(rest: List[String], acc: Map[String, String]): Map[String, String] = rest match {
      case key :: value :: tail if key.startsWith("--") =>
        go(tail, acc + (key.stripPrefix("--") -> value))
      case Nil => acc
      case other => sys.error(s"Cannot parse arguments: ${other.mkString(" ")}")
    }
    go(args, Map.empty)
  }
}
