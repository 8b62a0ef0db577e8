package graft.plans

/** Error policies — mirror of the reference's four `ON_ERROR_*` constants
  * (/root/reference/phaser/constants.py:4-7) and its exception taxonomy
  * (/root/reference/phaser/exceptions.py:1-45).
  *
  * In Spark a task cannot throw per-row without failing the whole job, so
  * policies are applied through the event-column convention (see
  * [[Events]]): validation expressions append typed events instead of
  * throwing, and the policy decides what the phase does with the row.
  * Only StopNow compiles to a real `raise_error` (all-or-nothing is exactly
  * its semantics).
  */
sealed trait ErrorPolicy { def name: String }
object ErrorPolicy {
  /** Emit a WARNING event, keep the row, keep processing it. */
  case object Warn extends ErrorPolicy { val name = "warn" }
  /** Emit an ERROR event; later steps skip the row but it is retained in
    * the output; the phase fails after its checkpoint is written. */
  case object Collect extends ErrorPolicy { val name = "collect" }
  /** Emit a DROPPED_ROW event and filter the row out at phase end. */
  case object DropRow extends ErrorPolicy { val name = "drop_row" }
  /** Fail the job immediately (`raise_error`). */
  case object StopNow extends ErrorPolicy { val name = "stop_now" }

  val all: Seq[ErrorPolicy] = Seq(Warn, Collect, DropRow, StopNow)
  def fromName(s: String): ErrorPolicy =
    all.find(_.name == s).getOrElse(
      throw GraftError(s"Supported on_error values are [${all.map(_.name).mkString(", ")}]"))
}

/** A coding/configuration bug — always thrown for real, never routed into
  * the event column (reference: PhaserError, context.py:140-141). */
final case class GraftError(message: String, cause: Throwable = null)
  extends RuntimeException(message, cause)

/** Driver-side signal that a phase collected ERROR events (reference:
  * DataException raised at pipeline.py:198-199 after checkpoint save). */
final case class DataException(message: String) extends RuntimeException(message)

/** Used by driver-side (context/batch) code that wants phaser's
  * WarningException semantics outside of compiled expressions. */
final case class WarningSignal(message: String) extends RuntimeException(message)

/** Used by row-level driver-side code to request a row drop (only legal in
  * row steps; reference: DropRowException, steps.py:147-150). */
final case class DropRowSignal(message: String) extends RuntimeException(message)
