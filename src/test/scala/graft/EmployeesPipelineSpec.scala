package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.{ColType, ColumnDef}
import graft.operators.BuiltinSteps
import graft.plans._
import graft.sources.{Format, GraftIO}

/** Port of the reference's end-to-end employees pipeline
  * (tests/pipelines/employees.py + tests/test_end_to_end.py): CSV read,
  * header renames, float cast with min_value, drop-row policy, check_unique,
  * derived columns, checkpoints with row numbers 1,2,4.
  */
class EmployeesPipelineSpec extends SparkSpec {

  private def fixtureCsv(dir: String): String = {
    val p = Paths.get(dir, "employees.csv")
    Files.writeString(p,
      """employeeNumber,firstName,lastName,payType,paidPer,payRate,bonusAmount,Status
        |1,Benjamin,Sisko,"salary","Year","188625","30000",Active
        |2,Kira,Nerys,"salary","Year","118625","20000",Active
        |,None,Garak,"salary","Year", 100000,,Inactive
        |3,Julian,Bashir,"salary","Year",142880,"25000",Active
        |""".stripMargin)
    p.toString
  }

  private def validator = Phase(
    name = "Validator",
    columns = Seq(
      ColumnDef("Employee ID", rename = Seq("employeeNumber")),
      ColumnDef("First name", rename = Seq("firstName")),
      ColumnDef("Last name", rename = Seq("lastName"), blank = false),
      ColumnDef("Pay rate", ColType.FloatT, rename = Seq("payRate"), minValue = Some(0.01)),
      ColumnDef("Pay type", rename = Seq("payType"),
        allowedValues = Seq("hourly", "salary", "exception hourly", "monthly", "weekly", "daily"),
        onErrorOpt = Some(ErrorPolicy.DropRow), save = false),
      ColumnDef("Pay period", rename = Seq("paidPer"))),
    steps = Seq(
      // drop_rows_with_no_id_and_not_employed (employees.py:31-40)
      Step.dropRowsWhen("drop_no_id_inactive",
        (col("Employee ID").isNull || trim(col("Employee ID")) === "") &&
          col("Status") === "Inactive",
        "Employee has no ID and inactive, dropping row"),
      Step.errorRowsWhen("error_no_id_active",
        (col("Employee ID").isNull || trim(col("Employee ID")) === "") &&
          col("Status") === "Active",
        "Missing employee ID for active employee, need to followup"),
      BuiltinSteps.checkUnique("Employee ID")))

  private def transformer = Phase(
    name = "Transformer",
    columns = Seq(
      ColumnDef("Pay rate", ColType.FloatT),
      ColumnDef("bonusAmount", ColType.FloatT, required = false)),
    steps = Seq(
      Step.withColumn("combine_full_name", "Full name",
        concat_ws(" ", col("First name"), col("Last name"))),
      Step.withColumn("calculate_annual_salary", "salary",
        when(col("Pay period") === "Hour", col("Pay rate") * 40 * 52)
          .when(col("Pay period") === "Day", col("Pay rate") * 5 * 52)
          .when(col("Pay period") === "Week", col("Pay rate") * 52)
          .when(col("Pay period") === "Month", col("Pay rate") * 12)
          .when(col("Pay period") === "Year", col("Pay rate"))
          .otherwise(lit(0.0))),
      Step.withColumn("calculate_bonus_percent", "Bonus percent",
        when(col("bonusAmount").isNotNull && col("salary") > 0,
          col("bonusAmount") / col("salary")))))

  test("employees pipeline end-to-end: drops Garak, keeps row numbers 1,2,4") {
    val workDir = Files.createTempDirectory("graft_employees").toString
    val src = fixtureCsv(workDir)
    val pipeline = new Pipeline(spark, Seq(validator, transformer),
      Paths.get(workDir, "out").toString, src,
      name = "EmployeeReviewPipeline", saveFormat = Format.Csv)
    val result = pipeline.run()

    assert(result.count() == 3) // one employee dropped
    val bonus = result.select(col("Bonus percent")).collect().map(_.getDouble(0))
    assert(bonus.forall(b => b > 0.1 && b < 0.2))

    // checkpoints exist and carry row numbers 1,2,4 (test_end_to_end.py:27-46)
    val validatorOut = GraftIO.readCsv(spark, Paths.get(workDir, "out", "Validator_output.csv").toString)
    assert(validatorOut.columns.contains(Events.RowNumCol))
    val rowNums = validatorOut.select(col(Events.RowNumCol).cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rowNums == Seq(1L, 2L, 4L))

    // save=false column dropped from checkpoint (H3)
    assert(!validatorOut.columns.contains("Pay type"))

    // errors file mentions the dropped row
    val errFile = Files.readString(Paths.get(workDir, "out", "errors_and_warnings.txt"))
    assert(errFile.contains("DROPPED_ROW"))

    // events recorded in context
    assert(pipeline.context.droppedCount("Validator") == 1)
  }

  test("zero-row output terminates the pipeline (X5, pipeline.py:191-192)") {
    val workDir = Files.createTempDirectory("graft_zero").toString
    val src = fixtureCsv(workDir)
    val dropAll = Phase("DropAll", steps = Seq(
      BuiltinSteps.filterRows(lit(false))))
    val pipeline = new Pipeline(spark, Seq(dropAll),
      Paths.get(workDir, "out").toString, src, saveFormat = Format.Csv)
    assertThrows[DataException](pipeline.run())
  }

  test("collected errors fail the phase after checkpoint (X5, pipeline.py:198-199)") {
    val workDir = Files.createTempDirectory("graft_err").toString
    val src = fixtureCsv(workDir)
    // Last name blank=false + a row with blank last name via a transform
    val failing = Phase("Failing", steps = Seq(
      Step.errorRowsWhen("always_error", col("Status") === "Inactive", "bad row")))
    val pipeline = new Pipeline(spark, Seq(failing),
      Paths.get(workDir, "out").toString, src, saveFormat = Format.Csv)
    val ex = intercept[DataException](pipeline.run())
    assert(ex.getMessage.contains("Failing"))
    // checkpoint was still written, with the error row retained (X4)
    val out = GraftIO.readCsv(spark, Paths.get(workDir, "out", "Failing_output.csv").toString)
    assert(out.count() == 4)
  }
}
