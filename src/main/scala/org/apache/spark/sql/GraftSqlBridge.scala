package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into the sql-package-private Column ↔ Expression converters,
 * needed since Spark 4 wrapped Column around ColumnNode: third-party
 * native expressions (graft.functions.*) build their Column surface
 * through this one indirection. The alternative — registering every
 * expression in the session FunctionRegistry and round-tripping through
 * `call_function` — adds a name-resolution hop for no benefit when the
 * expression is only used from the typed Scala API.
 */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a builder in an EXISTING session's function registry (the
    * path for sessions created without `spark.sql.extensions=...GraftExtensions`;
    * the extensions class covers config-time injection). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
