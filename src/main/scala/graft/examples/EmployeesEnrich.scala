package graft.examples

import org.apache.spark.sql.functions._

import graft.functions.{ColType, ColumnDef}
import graft.plans.{ErrorPolicy, Events, Phase, Step}

/** The reference's multi-source/multi-output example
  * (tests/pipelines/multi_source_and_outputs.py): validation, a managers
  * aggregation into a named extra output, and broadcast enrichment from a
  * 'departments' extra source (initialized from the CLI via
  * `--departments <path>`).
  */
object EmployeesEnrich {
  val validation: Phase = Employees.validator.copy(name = "Validation")

  val transformation: Phase = Employees.transformer.copy(
    name = "Transformation",
    columns = Employees.transformer.columns :+
      ColumnDef("manager_id", ColType.IntT, required = false),
    steps = Employees.transformer.steps :+
      Step.context("identify_managers") { (df, ctx) =>
        ctx.setOutput("managers",
          df.filter(col("manager_id").isNotNull)
            .groupBy(col("manager_id").cast("string").as("key"))
            .agg(count(lit(1)).cast("string").as("value")))
      },
    extraOutputs = Seq("managers"))

  val enrichment: Phase = Phase(
    name = "Enrichment",
    steps = Seq(
      // per-row warnings for missing/unmatched lookup keys, matching the
      // reference row step (multi_source_and_outputs.py:67-76): a bare
      // left join would leave a silent null in department_id
      Step.batch("add_department_id") { (df, ctx) =>
        val departments = ctx.getSource("departments").toDF("dep_name", "department_id")
        val joined = df.join(broadcast(departments),
          df("department") === col("dep_name"), "left").drop("dep_name")
        val missing = col("department").isNull || trim(col("department")) === ""
        val unmatched = !missing && col("department_id").isNull
        joined.withColumn(Events.EventsCol, concat(
          joined(Events.EventsCol),
          Events.appendTerm(missing, Events.WarningType, "add_department_id",
            concat(lit("Department name missing for employee ID "),
              coalesce(col("Employee ID").cast("string"), lit("null"))),
            ErrorPolicy.Warn),
          Events.appendTerm(unmatched, Events.WarningType, "add_department_id",
            concat(lit("Department name "), col("department"),
              lit(" invalid for employee ID "),
              coalesce(col("Employee ID").cast("string"), lit("null"))),
            ErrorPolicy.Warn)))
      }),
    extraSources = Seq("departments"))

  val phases: Seq[Phase] = Seq(validation, transformation, enrichment)
}
