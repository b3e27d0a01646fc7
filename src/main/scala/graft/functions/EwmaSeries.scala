package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ewma_series(values) → array<bigint>: the integer-EWMA recurrence
  * `e_1 = y_1; e_t = (num·y_t + (den−num)·e_{t−1}) DIV den` over a packed
  * per-key series, in ONE linear pass.
  *
  * This replaces the SQL `aggregate(...array_append...)` formulation,
  * whose accumulator copies the whole array every step — O(n²) element
  * copies per key (~7M at the 10-year span cap; the one calendar-bounded
  * quadratic SCALE_PROBE carried since r7). Same values bit-for-bit: the
  * JVM's Long division truncates toward zero exactly like Spark `DIV`
  * and DuckDB `//` (the r7 negative-step finding), so the hash-gated
  * `ts_ewma` oracle replays this expression unchanged.
  *
  * NULL input array → NULL; elements are non-null by construction (the
  * gap-filled spine coalesces silent days to 0 cents). α = num/den is a
  * plan-time constant pair, validated by the caller ([[Expression]]
  * instances ship no state beyond the two longs). */
case class EwmaSeries(child: Expression, alphaNum: Long, alphaDen: Long)
    extends UnaryExpression with CodegenFallback {
  require(alphaDen >= 2 && alphaNum >= 1 && alphaNum < alphaDen,
    s"alpha must satisfy 1 <= num < den, got $alphaNum/$alphaDen")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val values = v.asInstanceOf[ArrayData]
    val n = values.numElements()
    val out = new Array[Any](n)
    val keep = alphaDen - alphaNum
    var prev = 0L
    var i = 0
    while (i < n) {
      val y = values.getLong(i)
      val e = if (i == 0) y else (alphaNum * y + keep * prev) / alphaDen
      out(i) = e
      prev = e
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): EwmaSeries =
    copy(child = newChild)
  override def prettyName: String = "ewma_series"
}
