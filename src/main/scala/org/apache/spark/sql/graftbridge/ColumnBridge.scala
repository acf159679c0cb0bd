package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 made `Column` a backend-agnostic wrapper (Spark Connect); the
  * classic-backend converters are `private[sql]`, so this one-file shim lives
  * under `org.apache.spark.sql` to re-expose them to graft's native
  * expressions (the standard pattern for third-party Catalyst extensions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The string value of a literal Column, if it is one. (`expression`
    * returns a lazily-converted `ColumnNodeExpression`, so literal detection
    * must happen on the ColumnNode.)
    */
  def literalString(c: Column): Option[String] = c.node match {
    case org.apache.spark.sql.internal.Literal(s: String, _, _) => Some(s)
    case _ => None
  }

  /** Whether the Column is a NULL literal. */
  def isNullLiteral(c: Column): Boolean = c.node match {
    case org.apache.spark.sql.internal.Literal(null, _, _) => true
    case _ => false
  }
}
