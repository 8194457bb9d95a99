package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the classic Column internals for constructing Columns
  * from raw Catalyst expressions: `ExpressionUtils` is `private[sql]`
  * in Spark 4, so the (single, minimal) crossing point lives in this
  * package. Used by graft.functions.BloomPrefilter to wire Spark's own
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions —
  * which ship in spark-catalyst but have no public function wrapper —
  * into DataFrame code. No behavior of any Spark class is overridden
  * or extended here.
  */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
