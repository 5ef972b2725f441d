package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column<->Expression converters.
  *
  * Spark 4.x hides `Column(expr)` / `col.expr` behind the Spark
  * Connect-agnostic ColumnNode API; the classic converters still exist
  * (`org.apache.spark.sql.classic.ExpressionUtils`) but are
  * `private[sql]`. Declaring this object inside the `sql` package is
  * the standard extension-point pattern for libraries that build
  * native Catalyst expressions (the same access trick Spark's own
  * extensions tests use). Used by graft for the codegen'd
  * BloomFilterMightContain probe of the partitioned URL-seen filter.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
