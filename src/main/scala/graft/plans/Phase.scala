package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ColumnDef

/** A Phase = header canonicalization + declared-column cast/validate +
  * ordered steps + prepare-for-save (reference: phaser/phase.py:146-235).
  *
  * The whole phase composes lazily into ONE Catalyst plan; materialization
  * happens only at the pipeline's checkpoint boundary — the reference's
  * step-by-step full materialization (phase.py:88-128) is replaced by plan
  * composition, which is the main scale win.
  *
  * apply() returns the frame WITH internal columns (row numbers + event
  * channel); [[Pipeline]] handles policy application, checkpointing, and
  * stripping internals.
  */
final case class Phase(
    name: String,
    columns: Seq[ColumnDef] = Nil,
    steps: Seq[Step] = Nil,
    renumber: Boolean = false,
    extraSources: Seq[String] = Nil,
    extraOutputs: Seq[String] = Nil,
    /** Phase-level default error policy; None inherits the pipeline's
      * (reference: Phase error_policy attr, e.g. families.py; pipeline
      * default COLLECT). Per-column onErrorOpt still overrides. */
    errorPolicy: Option[ErrorPolicy] = None) {

  // Declared-rename conflicts are definition errors (phase.py:222-228).
  val renameList: Map[String, String] = {
    val pairs = for (c <- columns; alt <- c.rename) yield alt -> c.name
    pairs.groupBy(_._1).foreach { case (alt, targets) =>
      if (targets.map(_._2).distinct.size > 1)
        throw GraftError(
          s"Column cannot be renamed from $alt to ${targets.map(_._2).distinct.mkString(" and ")}, " +
            "please fix column declarations")
    }
    pairs.toMap
  }

  def diffable: Boolean = !renumber && !steps.exists(_.renumbers)

  /** Run the phase on a frame. */
  def apply(df0: DataFrame, ctx: Context): DataFrame = {
    val df = Events.withEventsCol(RowNum.ensure(df0))
    val renamed = renameColumns(df, ctx)
    val defaultPolicy = errorPolicy.getOrElse(ctx.errorPolicy)
    checkRequired(renamed, ctx, defaultPolicy)
    val casted0 = castColumns(renamed, defaultPolicy)
    // rows dropped by per-column DropRow policies are removed BEFORE steps
    // run (reference: DropRowException removes the row inside the column
    // pass, phase.py:101-105, so check_unique/batch steps never see it);
    // their events are tracked lazily and drained at the phase boundary.
    // Applied ONLY when a column can actually fire DropRow: the filter
    // predicate embeds the whole validation expression tree, and paying
    // that duplication on every phase would tax the common no-drop case.
    val canDrop = columns.exists(c =>
      c.onErrorOpt.getOrElse(defaultPolicy) == ErrorPolicy.DropRow)
    val casted = if (!canDrop) casted0 else {
      val dropped = Events.rowDropped(casted0(Events.EventsCol))
      ctx.registerDroppedEvents(name,
        casted0.filter(dropped)
          .select(col(Events.RowNumCol).as("row_num"),
            explode(col(Events.EventsCol)).as("e"))
          .filter(col("e.etype") === Events.DroppedType)
          .select(col("row_num"), col("e.etype").as("etype"),
            col("e.step").as("step"), col("e.message").as("message")))
      casted0.filter(!dropped)
    }
    val stepped = steps.foldLeft(casted)((d, s) => s(d, ctx, name))
    val renumbered = if (renumber) RowNum.renumber(stepped) else stepped
    prepareForSave(renumbered, ctx)
  }

  /** H1 — canonicalize headers: strip spaces/quotes, strict-name match to
    * declared names, then declared renames (phase.py:264-300). Pure driver
    * logic over df.columns + one projection. */
  private[plans] def renameColumns(df: DataFrame, ctx: Context): DataFrame = {
    val strictToDeclared = columns.map(c => c.strictName -> c.name).toMap
    val userCols = df.columns.filterNot(Events.internalCols.contains)

    // two headers collapsing onto one declared strict name is a coding error
    val canonicalized = userCols.map(ColumnDef.makeStrictName)
    strictToDeclared.keys.foreach { strict =>
      if (canonicalized.count(_ == strict) > 1)
        throw GraftError(s"Cannot reliably rename columns - $strict appears with different variations")
    }

    def renameMe(name0: String): String = {
      var n = name0.trim
      if (n.length >= 2 && n.startsWith("\"") && n.endsWith("\""))
        n = n.substring(1, n.length - 1)
      n = strictToDeclared.getOrElse(ColumnDef.makeStrictName(n), n)
      renameList.getOrElse(n, n)
    }

    val mapping = df.columns.map(c =>
      if (Events.internalCols.contains(c)) c -> c else c -> renameMe(c))
    // two distinct input headers landing on one final name (e.g. both the
    // declared name and its rename alias present) would produce a
    // duplicate-column frame and ambiguous references downstream — a
    // definition/data error, same class as the strict-name collision above
    val collisions = mapping.map(_._2).filterNot(Events.internalCols.contains)
      .groupBy(identity).filter(_._2.length > 1).keys
    if (collisions.nonEmpty)
      throw GraftError(
        s"Multiple source columns map to ${collisions.mkString(", ")} after renames")
    if (mapping.forall { case (a, b) => a == b }) df
    else df.withColumnsRenamed(mapping.toMap)
  }

  /** H2 — required declared columns must exist in the headers; the error
    * is routed through the column's effective policy (column.py:107-112
    * raises via use_exception): on_error=warn records a warning and the
    * phase continues (the column is synthesized as nulls by the cast pass);
    * any other policy is a hard failure. */
  private def checkRequired(df: DataFrame, ctx: Context,
      defaultPolicy: ErrorPolicy): Unit =
    columns.filter(_.required).foreach { c =>
      if (!df.columns.contains(c.name)) {
        val msg =
          s"Header ${c.name} not found in ${df.columns.filterNot(Events.internalCols.contains).mkString("[", ", ", "]")}"
        c.onErrorOpt.getOrElse(defaultPolicy) match {
          case ErrorPolicy.Warn => ctx.addWarning(name, "check_required", msg)
          case _ => throw DataException(msg)
        }
      }
    }

  /** The implicit first row-step: cast + validate every declared column in
    * declared order (cast_each_column_value, phase.py:241-261). Casting is
    * only applied when the column is required, saved, or present
    * (phase.py:251-252). Guarded so a row failed by an earlier column is
    * not modified by later ones (first-error-wins, as in the reference
    * where the row step aborts on first raise).
    *
    * Compiled as ONE projection over the input attributes: the events
    * column becomes `concat(events, term_1, ..., term_m)` (one conditional
    * singleton per check) and the "failed by an earlier column" guard is a
    * cumulative OR over the earlier columns' raw check predicates. A
    * per-column fold that guards on the accumulated events array references
    * the previous layer ~3x; after Catalyst's project-collapse inlines the
    * shared references the tree is ~3^k in the number of columns — hundreds
    * of copies at 5 columns, codegen falls over, evaluation goes
    * interpreted (round-1 driver bench: 179s for this query alone). */
  private[plans] def castColumns(df: DataFrame,
      defaultPolicy: ErrorPolicy = ErrorPolicy.Collect): DataFrame = {
    val applicable = columns.flatMap { cdef =>
      val present = df.columns.contains(cdef.name)
      if (!(cdef.required || cdef.save || present)) None
      else {
        val raw = if (present) df(cdef.name) else lit(null).cast("string")
        // failed rows keep the SAFE cast of their old value (try-cast
        // semantics: null when unparsable) — a bare df(name) here would be
        // implicitly ANSI-cast to the declared type when the branches
        // coerce, and an unparsable value on an already-failed row then
        // CRASHES the task instead of staying an event
        val oldVal = if (present) cdef.colType.cast(df(cdef.name))
                     else lit(null).cast(cdef.colType.sparkType)
        Some((cdef, oldVal,
          cdef.compileChecks(raw, s"cast_and_check:${cdef.name}", defaultPolicy)))
      }
    }
    if (applicable.isEmpty) df
    else {
      val e0 = df(Events.EventsCol)
      var failedBefore: org.apache.spark.sql.Column = Events.rowFailed(e0)
      val values = Map.newBuilder[String, org.apache.spark.sql.Column]
      val terms = Seq.newBuilder[org.apache.spark.sql.Column]
      applicable.foreach { case (cdef, oldVal, cc) =>
        val gate = !failedBefore
        values += cdef.name -> when(failedBefore, oldVal).otherwise(cc.value)
        cc.checks.foreach { case (cond, msg) =>
          terms += Events.appendTerm(gate && coalesce(cond, lit(false)),
            cc.etype, s"cast_and_check:${cdef.name}", msg, cc.policy)
        }
        failedBefore = failedBefore || cc.fails
      }
      df.withColumns(values.result() +
        (Events.EventsCol -> concat((e0 +: terms.result()): _*)))
    }
  }

  /** H3/H4 — consistency warning for undeclared new fields + drop
    * save=false columns (phase.py:302-327). Column-set comparison is pure
    * driver logic. */
  private def prepareForSave(df: DataFrame, ctx: Context): DataFrame = {
    // (new-field warnings are emitted by Pipeline, which knows the input
    // headers; here we only drop unsaved columns)
    val toDrop = columns.filter(!_.save).map(_.name)
    if (toDrop.isEmpty) df else df.drop(toDrop: _*)
  }
}
