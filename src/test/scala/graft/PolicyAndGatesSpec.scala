package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.{ColType, ColumnDef}
import graft.plans._
import graft.sources.Format

/** Remaining policy/gate coverage: STOP_NOW, check_size, archival,
  * collision check, missing required header. */
class PolicyAndGatesSpec extends SparkSpec {
  import spark.implicits._

  private def csv(dir: String, body: String): String = {
    val p = Paths.get(dir, "in.csv")
    Files.writeString(p, body)
    p.toString
  }

  test("on_error=stop_now fails the job immediately via raise_error (X1)") {
    val dir = Files.createTempDirectory("graft_stop").toString
    val src = csv(dir, "n\n1\nnot_a_number\n")
    val phase = Phase("Strict", columns = Seq(
      ColumnDef("n", ColType.IntT, onErrorOpt = Some(ErrorPolicy.StopNow))))
    val pipe = new Pipeline(spark, Seq(phase),
      Paths.get(dir, "out").toString, src, saveFormat = Format.Csv)
    val ex = intercept[Exception](pipe.run())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m => m.contains("cast_and_check") || m.contains("USER_RAISED")),
      s"unexpected failure: ${messages(ex)}")
  }

  test("per-column drop_row policy physically drops failing rows (C8/X1)") {
    val dir = Files.createTempDirectory("graft_cdrop").toString
    val src = csv(dir, "n,s\n1,keep\nbad,gone\n2,keep\n")
    val phase = Phase("ColDrop", columns = Seq(
      ColumnDef("n", ColType.IntT, onErrorOpt = Some(ErrorPolicy.DropRow)),
      ColumnDef("s")))
    val pipe = new Pipeline(spark, Seq(phase),
      Paths.get(dir, "out").toString, src, saveFormat = Format.Csv)
    val out = pipe.run()
    assert(out.count() == 2)
    assert(pipe.context.droppedCount("ColDrop") == 1)
  }

  test("per-column drop_row rows are removed BEFORE later steps run (phase.py:101-105)") {
    val dir = Files.createTempDirectory("graft_cdrop2").toString
    // row 2 duplicates id 1 but fails the type check with DropRow policy:
    // the reference drops it during the column pass, so check_unique passes
    val src = csv(dir, "id,ptype\n1,salary\n1,badtype\n2,salary\n")
    val phase = Phase("DropThenUnique",
      columns = Seq(
        ColumnDef("id"),
        ColumnDef("ptype", allowedValues = Seq("salary", "hourly"),
          onErrorOpt = Some(ErrorPolicy.DropRow))),
      steps = Seq(graft.operators.BuiltinSteps.checkUnique("id")))
    val pipe = new Pipeline(spark, Seq(phase),
      Paths.get(dir, "out").toString, src, saveFormat = Format.Csv)
    val out = pipe.run() // must NOT throw from check_unique
    assert(out.count() == 2)
    assert(pipe.context.droppedCount("DropThenUnique") == 1)
  }

  test("filter_rows reports dropped-row events (B4, builtin_steps.py:130-137)") {
    val dir = Files.createTempDirectory("graft_frep").toString
    val src = csv(dir, "n\n1\n2\n3\n4\n")
    val phase = Phase("Filtered",
      columns = Seq(ColumnDef.int("n")),
      steps = Seq(graft.operators.BuiltinSteps.filterRows(col("n") > 2)))
    val pipe = new Pipeline(spark, Seq(phase),
      Paths.get(dir, "out").toString, src, saveFormat = Format.Csv)
    assert(pipe.run().count() == 2)
    assert(pipe.context.droppedCount("Filtered") == 2)
  }

  test("phase-level error policy is inherited by undeclared-column policies (X1)") {
    val dir = Files.createTempDirectory("graft_pwarn").toString
    val src = csv(dir, "n\n1\nbad\n")
    // phase default Warn: the unparsable value becomes a warning, the row
    // is retained, and the phase does NOT fail
    val phase = Phase("Lenient",
      columns = Seq(ColumnDef("n", ColType.IntT)),
      errorPolicy = Some(ErrorPolicy.Warn))
    val pipe = new Pipeline(spark, Seq(phase),
      Paths.get(dir, "out").toString, src, saveFormat = Format.Csv)
    val out = pipe.run()
    assert(out.count() == 2)
    assert(pipe.context.eventsForPhase("Lenient").exists(_.etype == Events.WarningType))
    assert(!pipe.context.phaseHadErrors("Lenient"))
  }

  test("column pass is first-error-wins across columns in ONE projection " +
      "(a row failed by an earlier column is untouched by later ones; warns don't gate)") {
    val ctx = new Context(spark)
    val df = RowNum.assign(Seq(
      ("bad", "7", "x"),   // a unparsable -> b,c must stay untouched
      ("1", "bad", "x"),   // b unparsable (warn policy) -> c still runs
      ("2", "8", "zz")     // c over allowed length -> its own error only
    ).toDF("a", "b", "c"))
    val phase = Phase("P", columns = Seq(
      ColumnDef("a", ColType.IntT),
      ColumnDef("b", ColType.IntT, onErrorOpt = Some(ErrorPolicy.Warn)),
      ColumnDef("c", allowedValues = Seq("x"))))
    val out = phase(df, ctx).orderBy(col(Events.RowNumCol))
    val rows = out.select(col("a"), col("b"), col("c"),
      col(Events.EventsCol + ".etype")).collect()
    // row 1: a errored; b and c ride along as their safe-cast old values
    // (the declared types — a typed frame can't keep the raw string)
    assert(rows(0).isNullAt(0))
    assert(rows(0).getSeq[String](3) == Seq(Events.ErrorType))
    assert(rows(0).getLong(1) == 7L && rows(0).getString(2) == "x")
    // row 2: b's failure is a WARNING -> does not gate c; c still runs
    assert(rows(1).getSeq[String](3).count(_ == Events.WarningType) == 1)
    assert(rows(1).getString(2) == "x")
    // row 3: only c's allowed-values error
    assert(rows(2).getSeq[String](3) == Seq(Events.ErrorType))
    assert(rows(2).getLong(0) == 2L && rows(2).getLong(1) == 8L)
  }

  test("a row failed early with a LATER unparsable column stays an event, not a task crash " +
      "(ANSI would throw casting the old value to the declared type)") {
    val ctx = new Context(spark)
    val df = RowNum.assign(Seq(("bad", "alsobad"), ("1", "2")).toDF("a", "b"))
    val phase = Phase("P", columns = Seq(
      ColumnDef("a", ColType.IntT), ColumnDef("b", ColType.IntT)))
    val out = phase(df, ctx).orderBy(col(Events.RowNumCol)).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("a")))
    assert(out(0).isNullAt(out(0).fieldIndex("b"))) // safe cast, no crash
    assert(out(1).getLong(out(1).fieldIndex("a")) == 1L)
  }

  test("missing required header with on_error=warn records a warning and continues (column.py:107-112)") {
    val ctx = new Context(spark)
    val df = RowNum.assign(Seq("1").toDF("other"))
    val phase = Phase("Req", columns = Seq(
      ColumnDef("needed", onErrorOpt = Some(ErrorPolicy.Warn))))
    val out = phase(df, ctx)
    assert(ctx.events.exists(e =>
      e.etype == Events.WarningType && e.message.contains("needed")))
    // the column is synthesized as nulls by the cast pass and the phase runs
    assert(out.columns.contains("needed"))
    assert(out.select("needed").collect().forall(_.isNullAt(0)))
  }

  test("missing required header is a DataException (H2)") {
    val dir = Files.createTempDirectory("graft_req").toString
    val src = csv(dir, "other\n1\n")
    val phase = Phase("Req", columns = Seq(ColumnDef("needed")))
    val pipe = new Pipeline(spark, Seq(phase),
      Paths.get(dir, "out").toString, src, saveFormat = Format.Csv)
    val ex = intercept[DataException](pipe.run())
    assert(ex.getMessage.contains("needed"))
  }

  test("check_size warns on batch row-count change (X6)") {
    val ctx = new Context(spark)
    val df = RowNum.assign(Seq(1, 2, 3, 4).toDF("v"))
    val shrink = Step.Batch("shrink", (d, _) => d.filter(col("v") > 2), checkSize = true)
    shrink(df, ctx, "P")
    assert(ctx.events.exists(e =>
      e.etype == Events.WarningType && e.message.contains("2 rows were dropped")))
  }

  test("phase events are reported once: the next phase does not re-drain them") {
    val dir = Files.createTempDirectory("graft_redrain").toString
    val src = csv(dir, "v\n1\nx\n2\n")
    val p1 = Phase("One", columns = Seq(
      ColumnDef("v", graft.functions.ColType.IntT, onErrorOpt = Some(ErrorPolicy.Warn))))
    val p2 = Phase("Two")
    val pipe = new Pipeline(spark, Seq(p1, p2),
      Paths.get(dir, "out").toString, src, saveFormat = Format.Csv)
    pipe.run()
    val warns = pipe.context.events.filter(_.etype == Events.WarningType)
      .filterNot(_.step == "consistency_check")
    assert(warns.count(_.phase == "One") == 1) // the 'x' cast warning
    assert(!warns.exists(_.phase == "Two"))    // NOT re-attributed to Two
  }

  test("user steps appending DROPPED_ROW directly still leave an audit trail") {
    val dir = Files.createTempDirectory("graft_dropaudit").toString
    val src = csv(dir, "v\n1\n2\n3\n")
    // a raw batch step that marks v=2 dropped via the event channel,
    // bypassing FlagRows' registration path
    val step = Step.Batch("mark_dropped", (d, _) =>
      d.withColumn(Events.EventsCol,
        Events.append(d(Events.EventsCol), col("v") === "2",
          Events.DroppedType, "mark_dropped", lit("manually dropped"),
          ErrorPolicy.DropRow)))
    val pipe = new Pipeline(spark, Seq(Phase("P", steps = Seq(step))),
      Paths.get(dir, "out").toString, src, saveFormat = Format.Csv)
    val out = pipe.run()
    assert(out.count() == 2) // row physically removed
    assert(pipe.context.droppedCount("P") == 1) // ...and counted
    assert(pipe.context.events.exists(e =>
      e.etype == Events.DroppedType && e.message == "manually dropped"))
  }

  test("rename collision: declared name and its alias both present is a definition error") {
    val ctx = new Context(spark)
    val df = RowNum.assign(Seq(("1", "2")).toDF("id", "identifier"))
    val phase = Phase("P", columns = Seq(
      ColumnDef("id", rename = Seq("identifier"))))
    assertThrows[GraftError](phase(df, ctx))
  }

  test("previous-run outputs are archived into a timestamped dir (S8)") {
    val dir = Files.createTempDirectory("graft_arch").toString
    val src = csv(dir, "n\n1\n2\n")
    def pipe = new Pipeline(spark, Seq(Phase("One", Seq(ColumnDef.int("n")))),
      Paths.get(dir, "out").toString, src, name = "Arch", saveFormat = Format.Csv)
    pipe.run()
    pipe.run() // second run must move the first run's outputs aside
    val archived = Files.list(Paths.get(dir, "out")).iterator()
    val dirs = scala.jdk.CollectionConverters.IteratorHasAsScala(archived)
      .asScala.filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("Arch-"))
      .toSeq
    assert(dirs.nonEmpty)
    assert(Files.exists(dirs.head.resolve("One_output.csv")))
    // and the fresh outputs exist too
    assert(Files.exists(Paths.get(dir, "out", "One_output.csv")))
  }

  test("colliding expected outputs are a definition error (S9)") {
    val dir = Files.createTempDirectory("graft_coll").toString
    val src = csv(dir, "n\n1\n")
    val twice = Seq(Phase("Same"), Phase("Same"))
    val pipe = new Pipeline(spark, twice,
      Paths.get(dir, "out").toString, src, saveFormat = Format.Csv)
    assertThrows[GraftError](pipe.run())
  }

  test("outgoing-data-contract phase: a final columns-only phase reports contract violations (docs/user/advanced.md)") {
    val dir = Files.createTempDirectory("graft_contract").toString
    val src = csv(dir, "id,rate\n1,10.0\n2,-3.5\n3,8.0\n")
    val transform = Phase("Transform", columns = Seq(
      ColumnDef("id"), ColumnDef("rate", ColType.FloatT)))
    // the contract phase declares what OUTGOING data must satisfy; the
    // negative rate sails through Transform but is reported here
    val contract = Phase("ContractChecker", columns = Seq(
      ColumnDef("id", required = true, blank = false),
      ColumnDef("rate", ColType.FloatT, minValue = Some(0.01),
        onErrorOpt = Some(ErrorPolicy.Warn))))
    val pipe = new Pipeline(spark, Seq(transform, contract),
      Paths.get(dir, "out").toString, src, saveFormat = Format.Csv)
    val out = pipe.run()
    assert(out.count() == 3) // warn policy: reported, not dropped
    val report = Files.readString(Paths.get(dir, "out", "errors_and_warnings.txt"))
    assert(report.contains("less than min"))
    assert(report.contains("ContractChecker"))
  }

  test("streaming dedup drops duplicates within the watermark (Dedup family, streaming half)") {
    import graft.streaming.EventStreams
    val dir = Files.createTempDirectory("graft_sdedup").toString
    // stage events parquet twice => every event_id duplicated
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/a.parquet"))
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/b.parquet"))
    val stream = EventStreams.readEvents(spark, dir)
    val sq = EventStreams.runToMemory(
      EventStreams.dedupStream(stream, watermarkDelay = "1 hour"), "dedup_out")
    try {
      val n = spark.table("dedup_out").count()
      val distinctIds = Tables.load(spark, "/root/testdata/sf0.001", "events")
        .select("event_id").distinct().count()
      assert(n == distinctIds, s"expected $distinctIds distinct, got $n")
    } finally sq.stop()
  }
}
