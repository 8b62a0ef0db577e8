package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.{ErrorPolicy, Events, GraftError}

/** Column type declarations — the Spark ADT for the reference's Column
  * subclass hierarchy (/root/reference/phaser/column.py).
  *
  * Each type knows how to cast a raw (usually string) column to its typed
  * value and which cast failures to flag. Casting uses built-in Catalyst
  * expressions only (try_cast semantics via non-ANSI cast + null probes),
  * so everything stays inside whole-stage codegen.
  */
sealed trait ColType {
  def sparkType: DataType
  /** Cast the raw column; must yield null for null-ish input. */
  def cast(c: Column): Column
  /** True when the input was present but the cast could not parse it. */
  def castFailed(raw: Column, casted: Column): Column =
    isPresent(raw) && casted.isNull

  /** Non-null, non-NaN, non-empty after trim (reference is_nan_or_null +
    * is_empty, io.py:138-162: treats "NULL"/"None"/"nan" literals and
    * blank strings as absent). */
  protected def isPresent(c: Column): Column =
    c.isNotNull && !trim(c.cast(StringType)).isin("", "NULL", "None", "nan", "NaN")
}

object ColType {
  /** Base string column: only normalizes NaN to null (column.py:130-144). */
  case object Str extends ColType {
    val sparkType: DataType = StringType
    def cast(c: Column): Column =
      when(upper(trim(c.cast(StringType))) === "NAN", lit(null).cast(StringType))
        .otherwise(c.cast(StringType))
    override def castFailed(raw: Column, casted: Column): Column = lit(false)
  }

  /** int(Decimal(value)): "1.0" parses to 1; truncates toward zero
    * (column.py:280-283). try_cast keeps ANSI mode (Spark 4 default) from
    * throwing on malformed input — a parse failure must become an event,
    * not a task failure. */
  case object IntT extends ColType {
    val sparkType: DataType = LongType
    def cast(c: Column): Column =
      when(!isPresent(c), lit(null).cast(LongType))
        .otherwise(c.cast(StringType).try_cast(DecimalType(38, 18)).try_cast(LongType))
  }

  /** float(Decimal(value)) (column.py:291-294). */
  case object FloatT extends ColType {
    val sparkType: DataType = DoubleType
    def cast(c: Column): Column =
      when(!isPresent(c), lit(null).cast(DoubleType))
        .otherwise(c.cast(StringType).try_cast(DoubleType))
  }

  /** Truthy/falsey literal sets, case-insensitive (column.py:192-193);
    * unrecognized non-null input is a cast failure. */
  case object BoolT extends ColType {
    val trueValues = Seq("t", "true", "1", "yes", "y")
    val falseValues = Seq("f", "false", "0", "no", "n")
    val sparkType: DataType = BooleanType
    def cast(c: Column): Column = {
      val s = lower(trim(c.cast(StringType)))
      when(!isPresent(c), lit(null).cast(BooleanType))
        .when(s.isin(trueValues: _*), lit(true))
        .when(s.isin(falseValues: _*), lit(false))
        .otherwise(lit(null).cast(BooleanType))
    }
  }

  /** ISO8601 first, else the user-supplied Spark datetime pattern
    * (column.py:362-379; the reference takes strptime codes, the rebuild
    * takes Spark patterns — an intentional API deviation).
    *
    * `defaultTz`: naive timestamps (no explicit offset in the input) are
    * interpreted as wall-clock time in this zone (column.py:377-379:
    * `value.replace(tzinfo=default_tz)`); inputs that carry an explicit
    * offset/Z keep it. Unset = session timezone, Spark's default. */
  final case class DateTimeT(format: Option[String] = None,
      defaultTz: Option[String] = None) extends ColType {
    val sparkType: DataType = TimestampType
    def cast(c: Column): Column = {
      val s = trim(c.cast(StringType))
      val parsed = format match {
        case Some(f) => try_to_timestamp(s, lit(f))
        case None    => try_to_timestamp(s)
      }
      val zoned = defaultTz match {
        case None => parsed
        case Some(tz) =>
          // offset-carrying inputs were already anchored by the parser;
          // only naive ones are re-anchored from the declared zone.
          // ISO 8601 offsets: Z, +HH, +HHMM, +HH:MM — but only AFTER a
          // time component: a bare date like '2024-01-01' ends in '-01',
          // which a suffix-only probe would misread as a UTC offset and
          // skip the re-anchoring (the reference anchors dates too,
          // column.py:377-379)
          val hasOffset = s.rlike(
            "[0-9]{2}:[0-9]{2}(:[0-9]{2}(\\.[0-9]+)?)?\\s*(Z|[+-][0-9]{2}(:?[0-9]{2})?)$")
          when(hasOffset, parsed).otherwise(to_utc_timestamp(parsed, tz))
      }
      when(!isPresent(c), lit(null).cast(TimestampType)).otherwise(zoned)
    }
  }

  /** ISO first, then the unambiguous yyyy/MM/dd and yyyyMMdd fallbacks
    * (column.py:405-411, 441-459); ambiguous m/d/y deliberately rejected
    * unless a format is given. */
  final case class DateT(format: Option[String] = None) extends ColType {
    val sparkType: DataType = DateType
    def cast(c: Column): Column = {
      val s = trim(c.cast(StringType))
      val parsed = format match {
        case Some(f) => try_to_timestamp(s, lit(f)).cast(DateType)
        case None => coalesce(
          try_to_timestamp(s).cast(DateType),
          try_to_timestamp(s, lit("yyyy/MM/dd")).cast(DateType),
          try_to_timestamp(s, lit("yyyyMMdd")).cast(DateType))
      }
      when(!isPresent(c), lit(null).cast(DateType)).otherwise(parsed)
    }
  }
}

/** Declarative column: rename + cast + fix + validate, compiled to Catalyst
  * expressions. Mirrors reference Column's parameters (column.py:57-91) and
  * its fixed per-value processing order (check_and_cast_value,
  * column.py:114-128): null-check, cast, default+fix, checks.
  */
final case class ColumnDef(
    name: String,
    colType: ColType = ColType.Str,
    required: Boolean = true,
    nullable: Boolean = true,
    blank: Boolean = true,
    default: Option[Any] = None,
    fixValueFns: Seq[FixFn] = Nil,
    rename: Seq[String] = Nil,
    allowedValues: Seq[Any] = Nil,
    save: Boolean = true,
    /** Per-column policy override; None inherits the phase's policy, which
      * itself defaults to the pipeline's (reference: pipeline default
      * COLLECT, context.py:22,33; per-column override, column.py:83-87). */
    onErrorOpt: Option[ErrorPolicy] = None,
    minValue: Option[Any] = None,
    maxValue: Option[Any] = None,
    /** Custom named validations over the typed value — the Spark form of
      * subclassing Column and overriding check_value (the reference's
      * documented extension point, docs/user/advanced.md "custom column
      * validation"; column.py check_value). Each predicate returns the
      * INVALID condition; firings route through the column's on_error
      * policy exactly like the built-in checks. Keep predicates to pure
      * Column expressions (codegen'd); lookups against side data belong
      * in a row step, as the reference docs also advise for multi-column
      * or external checks. */
    customChecks: Seq[(String, Column => Column)] = Nil) {

  // definition-time checks (column.py:89-105)
  ColumnDef.checkColName(name)
  if (!nullable && default.isDefined)
    throw GraftError(
      s"Column $name defined to error on null values, but also provides a non-null default")

  /** The canonical header-matching key (make_strict_name, column.py:464-480). */
  def strictName: String = ColumnDef.makeStrictName(name)

  /** Backward-compatible accessor: explicit override or Collect. */
  def onError: ErrorPolicy = onErrorOpt.getOrElse(ErrorPolicy.Collect)

  /** Compile to (typedValue, events => events'): the typed value column and
    * an event-channel update covering every validation in reference order.
    * The caller wires the update into `__graft_events__` and guards the
    * value write on prior row failure. `defaultPolicy` applies when the
    * column declares no override (X1 policy inheritance).
    */
  def compile(raw: Column, stepName: String = "cast_and_check",
      defaultPolicy: ErrorPolicy = ErrorPolicy.Collect): (Column, Column => Column) = {
    val cc = compileChecks(raw, stepName, defaultPolicy)
    val update = (events: Column) =>
      cc.checks.foldLeft(events) { case (ev, (cond, msg)) =>
        Events.append(ev, cond, cc.etype, stepName, msg, cc.policy)
      }
    (cc.value, update)
  }

  /** Flat compile form for single-projection assembly: the typed value plus
    * the raw (cond, message) check list in reference order, so the caller
    * can emit each check exactly once (e.g. as a concat of conditional
    * singleton arrays) instead of nesting event-channel updates — nesting
    * makes the expression tree exponential in the number of columns once
    * Catalyst's project-collapse inlines the shared references. */
  def compileChecks(raw: Column, stepName: String = "cast_and_check",
      defaultPolicy: ErrorPolicy = ErrorPolicy.Collect): ColumnDef.Compiled = {
    val policy = onErrorOpt.getOrElse(defaultPolicy)
    val isNullish = raw.isNull ||
      trim(raw.cast(StringType)).isin("", "NULL", "None", "nan", "NaN")

    val casted = colType.cast(raw)

    // default fill then fix chain (fix_value, column.py:164-184)
    val defaulted = default match {
      case Some(d) => coalesce(casted, lit(d).cast(colType.sparkType))
      case None    => casted
    }
    val fixed = fixValueFns.foldLeft(defaulted)((c, f) => f(c))

    val nullErr = if (!nullable)
      Some((isNullish, lit(s"Null value found in column $name"))) else None

    val castErr = Some((colType.castFailed(raw, casted),
      concat(lit(s"Value "), coalesce(raw.cast(StringType), lit("null")),
        lit(s" in column $name could not be cast to ${colType.sparkType.simpleString}"))))

    val blankErr = if (!blank && colType == ColType.Str)
      Some((fixed.isNotNull && trim(fixed) === "",
        lit(s"Column '$name' had blank value"))) else None

    val allowedErr = if (allowedValues.nonEmpty)
      Some((fixed.isNotNull && !fixed.isin(allowedValues: _*),
        concat(lit(s"Column '$name' had value "), fixed.cast(StringType),
          lit(" not found in allowed values")))) else None

    val minErr = minValue.map(m =>
      (fixed.isNotNull && fixed < lit(m).cast(colType.sparkType),
        concat(lit(s"Value for $name is "), fixed.cast(StringType),
          lit(s", less than min $m"))))
    val maxErr = maxValue.map(m =>
      (fixed.isNotNull && fixed > lit(m).cast(colType.sparkType),
        concat(lit(s"Value for $name is "), fixed.cast(StringType),
          lit(s", more than max $m"))))

    // custom checks run last, on the typed value, null-safe (a predicate
    // returning null never fires — mirrors check_value running after the
    // built-in null handling)
    val customErrs = customChecks.map { case (checkName, invalid) =>
      (fixed.isNotNull && coalesce(invalid(fixed), lit(false)),
        concat(lit(s"Column '$name' value "), fixed.cast(StringType),
          lit(s" failed check $checkName")))
    }

    val checks = Seq(nullErr, castErr, blankErr, allowedErr, minErr, maxErr).flatten ++ customErrs
    ColumnDef.Compiled(fixed, checks, policy)
  }
}

object ColumnDef {
  /** Result of [[ColumnDef.compileChecks]]: typed value (unguarded), the
    * (condition, message) checks in reference order, and the effective
    * policy. `etype`/`fails` derive the event type and whether a firing
    * check marks the row failed (warnings don't). */
  final case class Compiled(value: Column, checks: Seq[(Column, Column)],
      policy: ErrorPolicy) {
    def etype: String =
      if (policy == ErrorPolicy.Warn) Events.WarningType
      else if (policy == ErrorPolicy.DropRow) Events.DroppedType
      else Events.ErrorType
    /** Predicate: any check fires AND the policy makes that a row failure. */
    def fails: Column =
      if (policy == ErrorPolicy.Warn || checks.isEmpty) lit(false)
      else checks.map { case (c, _) => coalesce(c, lit(false)) }.reduce(_ || _)
  }
  /** Reference forbids None/float/blank names and \n\t (column.py:92-105). */
  def checkColName(name: String): String = {
    if (name == null) throw GraftError("Column name cannot be None or a float")
    val trimmed = name.trim
    if (trimmed.isEmpty) throw GraftError("Column name cannot be blank")
    if (trimmed.exists(c => c == '\n' || c == '\t'))
      throw GraftError("Forbidden characters (newline or tab) in column name")
    trimmed
  }

  /** Canonical header key: lowercase, _/tab/newline to space, collapse
    * runs of spaces (make_strict_name, column.py:464-480). */
  def makeStrictName(name: String): String =
    name.toLowerCase
      .replace('_', ' ').replace('\t', ' ').replace('\n', ' ')
      .split("\\s+").filter(_.nonEmpty).mkString(" ")

  // convenience constructors mirroring the reference subclasses
  def str(name: String): ColumnDef = ColumnDef(name)
  def int(name: String): ColumnDef = ColumnDef(name, ColType.IntT)
  def float(name: String): ColumnDef = ColumnDef(name, ColType.FloatT)
  def bool(name: String): ColumnDef = ColumnDef(name, ColType.BoolT, nullable = false)
  def date(name: String): ColumnDef = ColumnDef(name, ColType.DateT())
  def datetime(name: String): ColumnDef = ColumnDef(name, ColType.DateTimeT())
}
