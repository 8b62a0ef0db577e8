package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver testdata (TESTDATA.md): one parquet per
  * table under the scale-factor dir. Reads are plain parquet scans so
  * Catalyst pushes filters/pruning into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session configs every graft SparkSession needs. `nanosAsLong` lets the
    * parquet reader accept the events table's TIMESTAMP(NANOS) column
    * (Spark has no nanosecond timestamp type); [[load]] converts it back to
    * a microsecond TimestampType column.
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // bucketed-table metadata (Scale.bucketedWrite) lives here; keep it
    // out of the repo working dir
    "spark.sql.warehouse.dir" -> "/tmp/graft_warehouse",
    // the 64-hash minhash signature schema exceeds the 25-field toString
    // default, which logs a noisy "Truncated plan" warning; print fully
    "spark.sql.debug.maxToStringFields" -> "200")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    if (table == "events")
      // ts arrives as long nanos (nanosAsLong); truncate to micros with
      // integer division (a double divide would lose precision at 1e18 ns),
      // matching DuckDB's CAST(ts_ns AS TIMESTAMP) on the oracle side.
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
