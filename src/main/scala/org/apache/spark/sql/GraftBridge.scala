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

/** `AbstractDataType` (the `inputTypes` element type of
  * ExpectsInputTypes) is `private[sql]`; this public alias lets graft's
  * expressions declare input types for proper analysis-time errors. */
object GraftTypes {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
