package graft.sources

import java.io.{BufferedReader, BufferedWriter, FileReader, FileWriter}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.plans.{DataException, GraftError}

/** Save formats (reference constants.py:9-11 CSV/JSON_RECORD; Parquet is
  * the rebuild's native format for checkpoints at scale). */
sealed trait Format { def extension: String }
object Format {
  case object Csv extends Format { val extension = "csv" }
  case object JsonRecord extends Format { val extension = "json" }
  case object Parquet extends Format { val extension = "parquet" }
  case object Orc extends Format { val extension = "orc" }

  def forPath(path: String): Format = {
    val ext = path.reverse.takeWhile(_ != '.').reverse.toLowerCase
    ext match {
      case "csv" => Csv
      case "json" => JsonRecord
      case "parquet" => Parquet
      case "orc" => Orc
      case other => throw GraftError(s"Unknown file format: '$other' (path $path)")
    }
  }
}

/** I/O with the reference's CSV/JSON quirks (phaser/io.py).
  *
  * Reads go through Spark readers (distributed, pushdown-capable); the
  * reference's quirks are reproduced as driver-side header checks plus
  * post-filters. Single-file saves (the reference writes exactly one file
  * per checkpoint) coalesce to one partition and move the part file to the
  * target name — a deliberate tap for debuggability, not the inter-phase
  * pipe (phases hand DataFrames to each other in memory; SURVEY §4.1).
  */
object GraftIO {

  private val CorruptCol = "__graft_corrupt__"

  /** S1 read_csv (io.py:34-60): header line; `#` comment lines skipped;
    * blank/comma-only lines dropped; duplicate header names are an error;
    * all values read as strings; custom delimiter.
    *
    * Ragged-row fidelity (io.py:45-55): a row with FEWER fields than the
    * header is an error ("Fields missing"), a row with non-empty EXTRA
    * fields is an error ("Inconsistent # of fields"), and trailing empty
    * extra fields are silently dropped (restkey/is_list_empty). Spark's
    * PERMISSIVE mode would null-fill all of these silently, so the read
    * declares an explicit all-string schema + corrupt-record column and a
    * bounded eager probe rejects genuinely malformed rows (the reference
    * reads eagerly too; this costs one extra pass over the CSV, which is
    * the debug-scale format — parquet is the scale path).
    *
    * `encoding` covers the reference's non-UTF-8 sources
    * (tests/test_csv.py:102-105 reads a latin1 file cleanly): the header
    * probe decodes with the same charset, and the ragged-row probe is
    * charset-agnostic (it counts ASCII delimiter/quote bytes only — any
    * mojibake from reading latin1 bytes as UTF-8 never changes a field
    * count). */
  def readCsv(spark: SparkSession, path: String, delimiter: String = ",",
      encoding: String = "UTF-8"): DataFrame = {
    val headers = readHeaders(path, delimiter, encoding)
    val base = spark.read
      .option("header", "true")
      .option("comment", "#")
      .option("delimiter", delimiter)
      .option("encoding", encoding)
      // RFC-4180 quote escaping ("" inside a quoted field), matching the
      // ragged-row probe's collapsing regex — Spark's default is backslash
      // escape, under which parser and probe would disagree on field
      // counts for lines with escaped quotes
      .option("escape", "\"")
      // all strings, as in the reference: typing happens in Phase columns
      .option("inferSchema", "false")
    val df = headers match {
      case None =>
        // glob/dir source: probe EVERY matched file driver-side so the
        // reference's per-file semantics hold (io.py:34-60 — dup-header
        // error, ragged-row errors), then read the whole glob in one
        // distributed pass. Header probing is one tiny driver read per
        // file (first non-comment line); the ragged check stays a single
        // distributed job over the full glob.
        val files = resolveFiles(spark, path)
        val probed = files.flatMap(f => readHeaders(f, delimiter, encoding).map(f -> _))
        if (probed.isEmpty) base.csv(path) // nothing probe-able (e.g. remote FS)
        else {
          val (firstFile, (_, canon)) = probed.head
          probed.find(_._2._2 != canon).foreach { case (f, (_, hs)) =>
            throw DataException(
              s"CSV files under <$path> disagree on headers: <$firstFile> has " +
                s"<${canon.mkString(",")}> but <$f> has <${hs.mkString(",")}>")
          }
          checkRaggedRows(spark, path, delimiter,
            probed.map(_._2._1).distinct, canon)
          val schema = org.apache.spark.sql.types.StructType(
            canon.map(h => org.apache.spark.sql.types.StructField(h, StringType)))
          base.option("mode", "PERMISSIVE").schema(schema).csv(path)
        }
      case Some((headerLine, hs)) =>
        checkRaggedRows(spark, path, delimiter, Seq(headerLine), hs)
        // with an explicit N-column schema, PERMISSIVE null-fills short
        // rows and keeps the first N fields of long ones — both fine,
        // because checkRaggedRows already rejected every genuinely
        // malformed row and the surviving long rows only had empty
        // trailing extras
        val schema = org.apache.spark.sql.types.StructType(
          hs.map(h => org.apache.spark.sql.types.StructField(h, StringType)))
        base.option("mode", "PERMISSIVE").schema(schema).csv(path)
    }
    // drop rows where every field is empty/null (comma-only lines and
    // all-empty-value rows, io.py:55-56)
    val allEmpty = df.columns
      .map(c => col(c).isNull || trim(col(c)) === "")
      .reduceOption(_ && _).getOrElse(lit(false))
    df.filter(!allEmpty)
  }

  /** Distributed ragged-row validation over the raw text lines (io.py:45-55).
    * The corrupt-record column of the CSV reader cannot be filtered on
    * directly (column pruning gives the parser a partial schema, so
    * length mismatches vanish — a documented Spark caveat), so the probe
    * counts each raw line's fields (quote-aware: quoted sections are
    * collapsed before counting delimiters) and applies the reference
    * rules: blank / all-delimiter lines are skipped; fewer fields than
    * the header -> "Fields missing"; more fields -> accepted only when
    * every extra is empty (restkey + is_list_empty: the line's tail
    * beyond the N-th field is just delimiters/whitespace), else
    * "Inconsistent # of fields". */
  private def checkRaggedRows(spark: SparkSession, path: String,
      delimiter: String, headerLines: Seq[String], hs: Seq[String]): Unit = {
    val d = java.util.regex.Pattern.quote(delimiter)
    val n = hs.length
    val v = col("value")
    // collapse quoted sections so delimiters inside quotes don't count
    def fieldCount(line: org.apache.spark.sql.Column) = {
      val noQuoted = regexp_replace(line, "\"(?:[^\"]|\"\")*\"", "x")
      (length(noQuoted) - length(regexp_replace(noQuoted, d, ""))) /
        delimiter.length + 1
    }
    val tokens = fieldCount(v)
    // after stripping trailing delimiters(+spaces): trailing EMPTY fields
    // vanish, so tokensStripped <= n means every extra field was empty
    val tokensStripped = fieldCount(regexp_replace(v, s"(?:$d\\s*)+$$", ""))
    val blank = trim(regexp_replace(regexp_replace(v, d, ""), "\\s", "")) === ""
    val isData = v.isNotNull && !blank && !v.startsWith("#") &&
      !v.isin(headerLines: _*)
    val bad = isData &&
      (tokens < n || (tokens > n && tokensStripped > n))
    spark.read.text(path).filter(bad)
      .select(v, (tokens < n).as("short"))
      .head(1).headOption.foreach { r =>
        val what = if (r.getBoolean(1)) "Fields missing" else "Inconsistent # of fields"
        throw DataException(s"$what in record <${r.getString(0)}>")
      }
  }

  /** Resolve a path/glob/dir to its matched data files (Hadoop glob
    * semantics — the same resolution Spark's reader performs), skipping
    * hidden/_metadata files. Used to run the reference's per-file header
    * checks on multi-file sources. */
  private def resolveFiles(spark: SparkSession, path: String): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
      .map(_.getPath)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .map(_.toUri.getPath)
      .sorted
  }

  /** Probe the raw header line driver-side with a quote-aware tokenizer
    * (a naive delimiter split would shred quoted headers containing the
    * delimiter); raises on duplicate names (io.py:41-42, Spark would
    * silently suffix-dedup them). Returns (rawHeaderLine, names); None for
    * globs/dirs where a single header line is ill-defined. */
  private def readHeaders(path: String, delimiter: String,
      encoding: String = "UTF-8"): Option[(String, Seq[String])] = {
    val p = Paths.get(path)
    if (!Files.isRegularFile(p)) return None
    val reader = new BufferedReader(new java.io.InputStreamReader(
      new java.io.FileInputStream(path), encoding))
    try {
      var line = reader.readLine()
      while (line != null && (line.trim.isEmpty || line.startsWith("#")))
        line = reader.readLine()
      if (line == null) None
      else {
        // Intentional deviation from the reference's curious-quote quirk
        // (tests/test_csv.py:66-71: `"id", "name"` keeps the raw ` "name"`
        // until a later phase canonicalizes it): we trim/unquote at read
        // time. Both converge after ColumnDef.makeStrictName, and the
        // early normal form keeps Spark schema names sane.
        val headers = splitCsvLine(line, delimiter)
          .map(_.trim.stripPrefix("\"").stripSuffix("\""))
        val dups = headers.groupBy(identity).filter(_._2.length > 1).keys
        if (dups.nonEmpty)
          throw DataException(s"Duplicate header names found: ${dups.mkString(", ")}")
        Some((line, headers))
      }
    } finally reader.close()
  }

  /** Minimal RFC-4180 field splitter: double quotes group fields, `""`
    * escapes a quote inside a quoted field. */
  private[sources] def splitCsvLine(line: String, delimiter: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inQuotes = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur.append('"'); i += 1
        } else if (c == '"') inQuotes = false
        else cur.append(c)
      } else if (c == '"') inQuotes = true
      else if (line.startsWith(delimiter, i)) {
        out += cur.result(); cur.clear(); i += delimiter.length - 1
      } else cur.append(c)
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** S2 read_json (io.py:14-26): record-format = a top-level JSON array of
    * objects = Spark's multiLine mode. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC: the other columnar scale format (Spark-native reader/writer,
    * same pushdown/pruning machinery as parquet) — pipelines exchanging
    * data with Hive/Trino estates read and write it by extension. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def read(spark: SparkSession, path: String, format: Option[Format] = None): DataFrame =
    format.getOrElse(Format.forPath(path)) match {
      case Format.Csv => readCsv(spark, path)
      case Format.JsonRecord => readJson(spark, path)
      case Format.Parquet => readParquet(spark, path)
      case Format.Orc => readOrc(spark, path)
    }

  /** S3 save_csv (io.py:164-190): one CSV file with header; NaN normalized
    * to empty (FixNansIterator, io.py:87-112); ragged-row union is native
    * (the DataFrame schema is already the union). Arrays/structs are
    * stringified to match the reference's CSV behavior. */
  def saveCsv(df: DataFrame, target: String,
      encoding: String = "UTF-8"): Unit = {
    val cleaned = df.columns.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
          d.withColumn(c, when(isnan(col(c)), lit(null)).otherwise(col(c)))
        case _: org.apache.spark.sql.types.ArrayType | _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.MapType =>
          d.withColumn(c, to_json(col(c)))
        case _ => d
      }
    }
    writeSingleFile(target) { tmpDir =>
      cleaned.coalesce(1).write.mode("overwrite")
        .option("header", "true").option("encoding", encoding).csv(tmpDir)
    }
  }

  /** S4 save_json (io.py:29-31): a single top-level JSON array. Written as
    * spark json-lines then wrapped line-by-line driver-side (streaming — no
    * full materialization in driver memory). */
  def saveJsonRecord(df: DataFrame, target: String): Unit = {
    val tmpDir = Files.createTempDirectory("graft_json").toString
    df.coalesce(1).write.mode("overwrite").json(tmpDir)
    val part = findPartFile(tmpDir, "part-")
    val out = new BufferedWriter(new FileWriter(target))
    val in = new BufferedReader(new FileReader(part.toFile))
    try {
      out.write("[")
      var first = true
      var line = in.readLine()
      while (line != null) {
        if (line.nonEmpty) {
          if (!first) out.write(",\n") else out.write("\n")
          out.write(line)
          first = false
        }
        line = in.readLine()
      }
      out.write("\n]\n")
    } finally { in.close(); out.close(); deleteRecursively(Paths.get(tmpDir)) }
  }

  def saveParquet(df: DataFrame, target: String): Unit =
    df.write.mode("overwrite").parquet(target)

  def saveOrc(df: DataFrame, target: String): Unit =
    df.write.mode("overwrite").orc(target)

  /** Hive-partitioned parquet sink — the 100 TB layout primitive. Readers
    * filtering on `partitionCols` prune whole directories at planning time
    * (PartitionFilters in the scan, zero I/O for excluded partitions), so
    * pick low-cardinality, always-filtered columns (source, lang, date).
    * High-cardinality keys belong in `Scale.bucketedWrite` instead — a
    * partition column with millions of values melts the file system and
    * the catalog long before it helps a query. */
  def savePartitionedParquet(df: DataFrame, target: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(target)
  }

  def save(df: DataFrame, path: String, format: Option[Format] = None): Unit =
    format.getOrElse(Format.forPath(path)) match {
      case Format.Csv => saveCsv(df, path)
      case Format.JsonRecord => saveJsonRecord(df, path)
      case Format.Parquet => saveParquet(df, path)
      case Format.Orc => saveOrc(df, path)
    }

  // ---- ExtraMapping <-> key/value table (io.py:231-242) ----

  /** A mapping side-input as a 2-col (key, value) DataFrame. */
  def mappingToDf(spark: SparkSession, mapping: Map[String, String]): DataFrame = {
    import spark.implicits._
    mapping.toSeq.toDF("key", "value")
  }

  def dfToMapping(df: DataFrame): Map[String, String] = {
    val Array(k, v) = df.columns
    df.select(col(k).cast(StringType), col(v).cast(StringType))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  // ---- single-file write helper ----

  private def writeSingleFile(target: String)(write: String => Unit): Unit = {
    val tmpDir = Files.createTempDirectory("graft_csv").toString
    write(tmpDir)
    val part = findPartFile(tmpDir, "part-")
    Files.createDirectories(Paths.get(target).toAbsolutePath.getParent)
    Files.move(part, Paths.get(target), StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(Paths.get(tmpDir))
  }

  private def findPartFile(dir: String, prefix: String): Path =
    Files.list(Paths.get(dir)).iterator().asScala
      .find(p => p.getFileName.toString.startsWith(prefix))
      .getOrElse(throw GraftError(s"No part file written under $dir"))

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
