package graft.examples

import org.apache.spark.sql.functions._

import graft.functions.{ColType, ColumnDef}
import graft.operators.BuiltinSteps
import graft.plans.{ErrorPolicy, Phase, Step}

/** The reference's documented example pipeline (tests/pipelines/
  * employees.py), re-expressed in the graft API. Ships as an example and as
  * the CLI smoke pipeline.
  */
object Employees {
  val validator: Phase = Phase(
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
      Step.dropRowsWhen("drop_no_id_inactive",
        (col("Employee ID").isNull || trim(col("Employee ID")) === "") &&
          col("Status") === "Inactive",
        "Employee has no ID and inactive, dropping row"),
      Step.errorRowsWhen("error_no_id_active",
        (col("Employee ID").isNull || trim(col("Employee ID")) === "") &&
          col("Status") === "Active",
        "Missing employee ID for active employee, need to followup"),
      BuiltinSteps.checkUnique("Employee ID")))

  val transformer: Phase = Phase(
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

  val phases: Seq[Phase] = Seq(validator, transformer)
}
