package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column <-> Expression converters
  * (Spark 4 wraps Column around ColumnNode; the classic converters are
  * `private[sql]`). Lives in the org.apache.spark.sql namespace the
  * same way other Spark-native libraries expose Dataset/Expression
  * internals (cf. public extension libs building custom expressions).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
