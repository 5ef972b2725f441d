package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.GraftSqlBridge

import graft.functions.FloatDot

/** SparkSessionExtensions hook exposing graft's codegen expressions to
  * the SQL surface: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) can write
  * `SELECT float_dot(a.embedding, b.embedding) ...` and get the
  * whole-stage-codegen dot product, not an interpreted fold.
  * [[GraftExtensions.registerAll]] installs the same functions into an
  * ALREADY-RUNNING session (the extension point fires only at session
  * build; the registry route covers notebooks/tests that join late).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"float_dot(a, b) takes 2 arguments, got ${args.length}")
        FloatDot(args(0), args(1))
      }))

  /** Register every graft SQL function into a live session's registry. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      GraftSqlBridge.registerFunction(spark, id, info, builder)
    }
}
