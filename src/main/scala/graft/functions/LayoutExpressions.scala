package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit-interleave of two keys:
  * `graft_zorder(a, b)` → BIGINT with a's bits on even positions and b's on
  * odd positions. The low 32 bits of each input are used (callers bound
  * their dimensions; [[graft.operators.ZOrderLayout]] uses 16-bit dims so
  * the DuckDB oracle's shift/mask arithmetic can mirror it overflow-free).
  *
  * Why it matters at 100 TB: sorting a table by ONE column gives parquet
  * min/max (row-group / file) pruning on that column only — a query
  * filtering the OTHER column scans everything. Sorting by the interleaved
  * z-value bounds BOTH dimensions within every contiguous slice of the
  * layout, so min/max skipping prunes on either dimension (the Z-ordering
  * idea from the Hilbert/Morton data-clustering literature, as popularized
  * by lakehouse OPTIMIZE ZORDER BY implementations).
  *
  * The spread uses the standard magic-mask doubling: each step doubles the
  * gap between occupied bits. Codegen emits the same straight-line longs —
  * no loops, stays in whole-stage codegen.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == LongType && right.dataType == LongType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_zorder requires BIGINT inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrder2.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 32 bits of v one position apart (bit i → bit 2i). */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: a on even bit positions, b on odd. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
