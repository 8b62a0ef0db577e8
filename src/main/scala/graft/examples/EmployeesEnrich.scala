package graft.examples

import org.apache.spark.sql.functions._

import graft.functions.{ColType, ColumnDef}
import graft.plans.{Phase, Step}

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
      Step.batch("add_department_id") { (df, ctx) =>
        val departments = ctx.getSource("departments").toDF("dep_name", "department_id")
        df.join(broadcast(departments),
          df("department") === col("dep_name"), "left").drop("dep_name")
      }),
    extraSources = Seq("departments"))

  val phases: Seq[Phase] = Seq(validation, transformation, enrichment)
}
