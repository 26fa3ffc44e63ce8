package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal access bridge to Spark's `private[sql]` Column⇄Expression
 * converters. Since the Spark Connect refactor, `Column` wraps a
 * `ColumnNode` and the classic-expression adapters live behind
 * `private[sql]`; a library that builds non-registry Catalyst expressions
 * (e.g. graft.iforest.IForestScore, which embeds a Broadcast handle and so
 * cannot be constructed from a SQL function registry builder) needs this
 * two-line shim in the `org.apache.spark.sql` namespace. No Spark internals
 * are re-implemented here — calls delegate verbatim.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
