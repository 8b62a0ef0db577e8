package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.{ColType, ColumnDef}
import graft.operators.BuiltinSteps
import graft.plans._
import graft.sources.{Format, GraftIO}

/** Port of the reference's multi-source/multi-output e2e
  * (tests/pipelines/multi_source_and_outputs.py +
  * tests/test_multi_source_and_outputs.py): lookup-enrichment join from a
  * named extra source, aggregation into a named extra output, three phases.
  */
class MultiSourceSpec extends SparkSpec {

  private def writeFixtures(dir: String): (String, String) = {
    val emp = Paths.get(dir, "more-employees.csv")
    Files.writeString(emp,
      """employeeNumber,firstName,lastName,payType,paidPer,payRate,bonusAmount,Status,department,manager_id
        |1,Benjamin,Sisko,"salary","Year","188625","30000",Active,Marketing,4
        |2,Kira,Nerys,"salary","Year","118625","20000",Active,Finance,
        |,None,Garak,"salary","Year", 100000,,Inactive,Finance,
        |4,Rasma,Son,"salary","Year",230000,24000,Active,Marketing,
        |5,Aldina,Sharrow,"salary","Year",140000,18000,Active,Finance,2
        |6,Viktor,Matic,"salary","Year",180000,25000,Active,Finance,2
        |""".stripMargin)
    val dep = Paths.get(dir, "departments.csv")
    Files.writeString(dep,
      """key,value
        |Finance,1
        |Marketing,2
        |Engineering,3
        |People,4
        |Sales,5
        |""".stripMargin)
    (emp.toString, dep.toString)
  }

  private val validation = graft.examples.Employees.validator.copy(name = "Validation")

  private val transformation = Phase(
    name = "Transformation",
    columns = Seq(
      ColumnDef("Pay rate", ColType.FloatT),
      ColumnDef("bonusAmount", ColType.FloatT, required = false),
      ColumnDef("manager_id", ColType.IntT, required = false)),
    steps = Seq(
      Step.withColumn("combine_full_name", "Full name",
        concat_ws(" ", col("First name"), col("Last name"))),
      Step.withColumn("calculate_annual_salary", "salary",
        when(col("Pay period") === "Year", col("Pay rate")).otherwise(lit(0.0))),
      Step.withColumn("calculate_bonus_percent", "Bonus percent",
        when(col("bonusAmount").isNotNull && col("salary") > 0,
          col("bonusAmount") / col("salary"))),
      // identify_managers: aggregation into the named 'managers' output
      // (reference builds a defaultdict during row iteration; the rebuild
      // declares it as a groupBy — SURVEY §4.3)
      Step.context("identify_managers") { (df, ctx) =>
        ctx.setOutput("managers",
          df.filter(col("manager_id").isNotNull)
            .groupBy(col("manager_id").cast("string").as("key"))
            .agg(count(lit(1)).cast("string").as("value")))
      }),
    extraOutputs = Seq("managers"))

  private val enrichment = Phase(
    name = "Enrichment",
    steps = Seq(
      Step.batch("add_department_id") { (df, ctx) =>
        val departments = ctx.getSource("departments")
          .toDF("dep_name", "department_id")
        val joined = df.join(broadcast(departments),
          df("department") === col("dep_name"), "left")
          .drop("dep_name")
        joined
      }),
    extraSources = Seq("departments"))

  test("multi-source pipeline: broadcast enrichment + managers extra output") {
    val dir = Files.createTempDirectory("graft_multi").toString
    val (emp, dep) = writeFixtures(dir)
    val work = Paths.get(dir, "out").toString
    val pipeline = new Pipeline(spark,
      Seq(validation, transformation, enrichment), work, emp,
      name = "EmployeeEnrichPipeline", saveFormat = Format.Csv,
      extraSourcePaths = Map("departments" -> dep))
    val result = pipeline.run()

    // one employee dropped; bonus percents in range (test_multi_source:26-28)
    assert(result.count() == 5)
    val rows = result.orderBy(col("Employee ID").cast("long")).collect()
    assert(rows.forall { r =>
      val b = r.getAs[Double]("Bonus percent"); b > 0.1 && b < 0.2
    })

    // department ids resolved through the lookup join (:30-34)
    assert(rows.map(_.getAs[String]("department_id")).toSeq ==
      Seq("2", "1", "2", "1", "1"))
    // manager ids preserved (:36-40)
    assert(rows.map(r => Option(r.getAs[java.lang.Long]("manager_id"))
      .map(_.toString).getOrElse("")).toSeq == Seq("4", "", "", "2", "2"))

    // all four outputs exist (:21-24)
    for (f <- Seq("Validation_output.csv", "Transformation_output.csv",
        "Enrichment_output.csv", "managers.csv"))
      assert(Files.exists(Paths.get(work, f)), s"missing $f")

    // managers.csv aggregated counts: manager 2 has 2 reports, manager 4 has 1
    val managers = GraftIO.dfToMapping(
      GraftIO.readCsv(spark, Paths.get(work, "managers.csv").toString))
    assert(managers == Map("2" -> "2", "4" -> "1"))
  }

  test("unmatched/missing lookup keys emit per-row warnings (multi_source_and_outputs.py:67-76)") {
    import spark.implicits._
    val ctx = new Context(spark)
    ctx.setSource("departments", Seq(("Finance", "1")).toDF("key", "value"))
    val input = RowNum.assign(
      Seq(("1", "Finance"), ("2", "Ghost"), ("3", null))
        .toDF("Employee ID", "department"))
    val out = graft.examples.EmployeesEnrich.enrichment(input, ctx)
    ctx.collectRowEvents("Enrichment", out)
    val warns = ctx.eventsForPhase("Enrichment")
      .filter(_.etype == Events.WarningType)
      .filter(_.step == "add_department_id")
    assert(warns.map(_.message).toSet == Set(
      "Department name Ghost invalid for employee ID 2",
      "Department name missing for employee ID 3"))
    // matched row enriched, unmatched rows retained with null id
    val rows = out.orderBy(col("Employee ID")).collect()
    assert(rows.map(_.getAs[String]("department_id")).toSeq == Seq("1", null, null))
  }
}
