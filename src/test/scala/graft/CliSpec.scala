package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import graft.cli.Main

/** CLI surface specs (reference: tests/test_command_run.py — runs a
  * pipeline by name, rejects unknown pipelines, describe output).
  * The usage/exit(2) branch is left untested on purpose (sys.exit). */
class CliSpec extends SparkSpec {

  private def employeesCsv(dir: String): String = {
    val p = Paths.get(dir, "employees.csv")
    Files.writeString(p,
      """employeeNumber,firstName,lastName,payType,paidPer,payRate,bonusAmount,Status
        |1,Benjamin,Sisko,"salary","Year","188625","30000",Active
        |2,Kira,Nerys,"salary","Year","118625","20000",Active
        |3,Julian,Bashir,"salary","Year",142880,"25000",Active
        |""".stripMargin)
    p.toString
  }

  test("run executes a registered pipeline end-to-end (test_command_run.py:test_runs_a_pipeline)") {
    spark // force shared session so Main's getOrCreate reuses it
    val workDir = Files.createTempDirectory("graft-cli").toString
    val src = employeesCsv(workDir)
    val out = new ByteArrayOutputStream()
    Console.withOut(out) {
      Main.main(Array("run", "employees", workDir, src))
    }
    assert(out.toString.contains("pipeline employees finished"))
    val files = Files.list(Paths.get(workDir)).toArray.map(_.toString)
    assert(files.exists(_.endsWith("Validator_output.csv")))
  }

  test("unknown pipeline name fails and lists known pipelines (test_command_run.py failure scenarios)") {
    val workDir = Files.createTempDirectory("graft-cli").toString
    val err = intercept[RuntimeException] {
      Main.main(Array("run", "doesnotexist", workDir, s"$workDir/nope.csv"))
    }
    assert(err.getMessage.contains("Unknown pipeline 'doesnotexist'"))
    assert(err.getMessage.contains("employees"))
  }

  test("unknown --format is rejected before any work happens") {
    val workDir = Files.createTempDirectory("graft-cli").toString
    val err = intercept[RuntimeException] {
      Main.main(Array("run", "employees", workDir, s"$workDir/nope.csv",
        "--format", "xml"))
    }
    assert(err.getMessage.contains("Unknown --format 'xml'"))
  }

  test("malformed trailing arguments are rejected") {
    val err = intercept[RuntimeException] {
      Main.main(Array("run", "employees", "/tmp", "/tmp/x.csv", "stray"))
    }
    assert(err.getMessage.contains("Cannot parse arguments"))
  }

  test("run drives the curation pipeline from a parquet source end-to-end") {
    spark
    val workDir = Files.createTempDirectory("graft-cli-cur").toString
    val out = new ByteArrayOutputStream()
    Console.withOut(out) {
      Main.main(Array("run", "curation", workDir,
        "/root/testdata/sf0.001/documents.parquet", "--format", "parquet"))
    }
    assert(out.toString.contains("pipeline curation finished"))
    val files = Files.list(Paths.get(workDir)).toArray.map(_.toString)
    assert(files.exists(_.endsWith("Dedup_output.parquet")))
  }

  test("debug runs phases without checkpoints, printing counts and event tallies") {
    spark
    val workDir = Files.createTempDirectory("graft-cli").toString
    val src = employeesCsv(workDir)
    val out = new ByteArrayOutputStream()
    Console.withOut(out) {
      Main.main(Array("debug", "employees", src, "--explain", "true"))
    }
    val text = out.toString
    assert(text.contains("phase Validator: 3 rows"))
    assert(text.contains("phase Transformer: 3 rows"))
    assert(text.contains("Physical Plan")) // --explain true emits formatted plans
    // debug must not write checkpoint files anywhere
    assert(!Files.list(Paths.get(workDir)).toArray.map(_.toString)
      .exists(_.contains("_output")))
  }

  test("describe prints phases, columns, and steps") {
    val out = new ByteArrayOutputStream()
    Console.withOut(out) { Main.main(Array("describe", "employees")) }
    val text = out.toString
    assert(text.contains("phase Validator"))
    assert(text.contains("column Pay rate: double"))
    assert(text.contains("unsaved")) // Pay type is save=false
    assert(text.contains("step"))
  }
}
