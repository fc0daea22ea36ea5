package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL surface for graft's native expressions. Two entry points:
 *
 *  - config-time: `spark.sql.extensions=graft.functions.GraftExtensions`
 *    injects every function into each new session's registry;
 *  - runtime: `GraftFunctions.register(spark)` for an existing session.
 *
 * Either way `SELECT cosine_similarity(a, b)` works from plain SQL with
 * the same codegen'd kernel the Scala API uses.
 */
object GraftFunctions {

  private def binary(name: String, mk: (Expression, Expression) => Expression)
      (args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
    mk(args.head, args(1))
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      binary("cosine_similarity", CosineSimilarity.apply) _),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      binary("dot_product", DotProduct.apply) _),
    (FunctionIdentifier("l2_distance"),
      new ExpressionInfo(classOf[L2Distance].getName, "l2_distance"),
      binary("l2_distance", L2Distance.apply) _))

  /** Register every graft function into an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      GraftSqlBridge.registerFunction(spark, id.funcName, builder)
    }
}

/** `spark.sql.extensions` entry point (tier-(c) operator machinery:
  * session-extension registration, the same hook a custom Rule/Strategy
  * would use). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
