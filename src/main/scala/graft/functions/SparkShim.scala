// Lives in the org.apache.spark.sql package solely to reach three
// private[sql] helpers: ExpressionUtils (Column <-> catalyst Expression
// bridging in Spark 4.x's connect-compatible Column) and
// Observation.getOrEmpty (bounded <=100ms wait, the only non-hanging
// getter) — nothing else.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def observationGetOrEmpty(obs: Observation): Map[String, Any] = obs.getOrEmpty
}
