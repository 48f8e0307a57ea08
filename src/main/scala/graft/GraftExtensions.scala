package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FloatVecDot

/** Session extension registering this engine's custom Catalyst
  * expressions with the SQL function registry, so `spark.sql` users get
  * them too:
  *
  *  - `float_vec_dot(a, b)` — codegen'd array<float> dot product.
  *
  * Wire up either at build time
  * (`SparkSession.builder.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.GraftExtensions`) or onto a live session
  * via [[GraftExtensions.register]]. */
/** Session extension registering the engine's custom SQL functions and
  * optimizer rules (see [[graft.plans.ChainHeadsRule]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.ChainHeadsRule())
  }
}

object GraftExtensions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "float_vec_dot requires exactly 2 arguments")
        FloatVecDot(children.head, children(1))
      }))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
