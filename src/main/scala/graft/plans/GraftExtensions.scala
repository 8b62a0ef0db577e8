package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

import graft.functions.{DotProduct, MinhashSignature, SimhashFingerprint, VectorExpressions, WinnowFingerprints}

/** SparkSessionExtensions hook: registers graft's native expressions in the
  * session catalog so plain SQL resolves them without any Scala-side
  * registration call — `SELECT graft_dot(a, b)`,
  * `SELECT graft_minhash(split(text, ' '), 64)`,
  * `SELECT graft_simhash(split(text, ' '))`.
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` on
  * spark-submit. (The Scala-side helpers — MinhashExpression.signature
  * etc. — self-register per session and don't need this hook; the hook
  * exists for SQL-only entry points: thrift server, spark-sql shell,
  * notebooks speaking pure SQL.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(VectorExpressions.DotName),
      new ExpressionInfo(classOf[DotProduct].getName, VectorExpressions.DotName),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case IntegerLiteral(k) => MinhashSignature(exprs(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_minhash's second argument must be a literal int, got $other")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashFingerprint].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimhashFingerprint(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (exprs: Seq[Expression]) => (exprs(1), exprs(2)) match {
        case (IntegerLiteral(k), IntegerLiteral(w)) =>
          WinnowFingerprints(exprs(0), k, w)
        case other => throw new IllegalArgumentException(
          s"graft_winnow's k and w must be literal ints, got $other")
      }))
  }
}
