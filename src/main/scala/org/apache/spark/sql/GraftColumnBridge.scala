package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression↔Column bridge for graft's custom codegen'd expressions
  * ([[graft.functions.VecDot]], [[graft.functions.ZRangeContains]]).
  *
  * Spark 4 moved expression-backed Column construction behind
  * `private[sql]` (`classic.ExpressionUtils`); the public alternative is
  * the session FunctionRegistry, which resolves at ANALYSIS time against
  * the DataFrame's session — a library API built on it fails on any
  * session without [[graft.plans.GraftExtensions]] installed. This shim
  * lives in `org.apache.spark.sql` purely to re-export the two
  * conversions (the established pattern for Spark-native libraries);
  * it contains no logic. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
