package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's sql-package-private Expression↔Column
  * converters (`classic.ExpressionUtils` is `private[sql]` at source
  * level in Spark 4.x). Standard technique for libraries shipping
  * native Catalyst expressions. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
