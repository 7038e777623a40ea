package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionColumnNode, SparkSession => ClassicSession}

/** Column ⇄ Expression bridge for custom catalyst expressions.
  *
  * Spark 4 moved the Column↔Expression constructors behind private[sql]
  * (`ExpressionColumnNode`, `Column.apply`), so libraries shipping their
  * own codegen'd expressions host a small shim inside the
  * `org.apache.spark.sql` package — the established pattern for catalyst
  * extension libraries. This is the engine's only package-private
  * dependency on Spark internals.
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  def expression(c: Column): Expression =
    SparkSession.active.asInstanceOf[ClassicSession].expression(c)
}
