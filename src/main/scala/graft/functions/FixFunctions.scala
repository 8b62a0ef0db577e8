package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.plans.GraftError

/** Whitelist registry replacing the reference's `call_method_on` dispatch
  * (/root/reference/phaser/column.py:483-507). The reference resolves
  * string function names via attribute lookup and `eval`; the rebuild
  * deliberately replaces `eval` with this named registry of codegen'd
  * Catalyst expressions, plus arbitrary Scala `Column => Column` lambdas
  * for anything not listed.
  */
object FixFunctions {
  val registry: Map[String, Column => Column] = Map(
    // string methods
    "strip" -> (c => trim(c)),
    "lstrip" -> (c => ltrim(c)),
    "rstrip" -> (c => rtrim(c)),
    "lower" -> (c => lower(c)),
    "upper" -> (c => upper(c)),
    // Python str.capitalize: first char upper, rest lower (NOT per-word
    // initcap)
    "capitalize" -> (c =>
      concat(upper(substring(c, 1, 1)), lower(substring(c, 2, Int.MaxValue)))),
    "title" -> (c => initcap(c)),
    // numeric
    "abs" -> (c => abs(c)),
    "round" -> (c => round(c)),
    "floor" -> (c => floor(c)),
    "ceil" -> (c => ceil(c)),
    // date/datetime accessors (reference examples: value.weekday(), .year)
    "year" -> (c => year(c)),
    "month" -> (c => month(c)),
    "day" -> (c => dayofmonth(c)),
    "hour" -> (c => hour(c)),
    // Python date.weekday(): Monday=0..Sunday=6; Spark dayofweek: Sunday=1
    "weekday" -> (c => (dayofweek(c) + lit(5)) % lit(7)),
    // misc
    "len" -> (c => length(c)))

  def byName(name: String): Column => Column =
    registry.getOrElse(name,
      throw GraftError(s"Unknown fix_value function '$name'; known: ${registry.keys.toSeq.sorted.mkString(", ")}"))
}

/** A fix step: either a registry name or an arbitrary Column function. */
sealed trait FixFn { def apply(c: Column): Column }
object FixFn {
  final case class Named(name: String) extends FixFn {
    private val f = FixFunctions.byName(name)
    def apply(c: Column): Column = f(c)
  }
  final case class Fn(f: Column => Column) extends FixFn {
    def apply(c: Column): Column = f(c)
  }
  import scala.language.implicitConversions
  implicit def fromString(name: String): FixFn = Named(name)
  implicit def fromFunction(f: Column => Column): FixFn = Fn(f)
}
