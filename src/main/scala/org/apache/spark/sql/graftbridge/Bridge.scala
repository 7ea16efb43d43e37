package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's classic Column↔Expression converters are `private[sql]`;
  * this bridge lives under `org.apache.spark.sql` to re-export the two
  * calls custom-Expression libraries need (the usual extension-library
  * pattern — no Spark internals are modified). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
