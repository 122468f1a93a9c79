package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Package bridge into the sql-private Column factory.
  *
  * Spark 4 hides `Column(expr)` behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils.column`); the supported
  * public routes are `functions.lit` (rejects collection values) and
  * `typedlit` (needs a compile-time TypeTag, unavailable for wire-decoded
  * types). The Consumer needs to wrap ONE pre-built catalyst `Literal`
  * holding a whole array value — the elementwise `array(lit, lit, …)`
  * fallback builds a Column tree with thousands of children that every
  * analyzer pass re-walks. A sql-subpackage object is the standard OSS
  * escape hatch for this (Delta Lake, spark-excel et al. ship the same
  * shim).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
