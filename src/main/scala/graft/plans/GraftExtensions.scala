package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, VectorExpressions}

/** SparkSessionExtensions hook: registers graft's native expressions in the
  * session catalog so plain SQL (`SELECT graft_dot(a, b)`) resolves them
  * without any Scala-side registration call.
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` on
  * spark-submit.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(VectorExpressions.DotName),
      new ExpressionInfo(classOf[DotProduct].getName, VectorExpressions.DotName),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
  }
}
