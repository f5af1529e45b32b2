package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Single-NODE Catalyst expressions for the DetMath deterministic
  * elementary functions.
  *
  * Why expressions and not Column trees: the original Column-built forms
  * (range reduction + Horner assembled from built-in arithmetic) are
  * CORRECT but their serialized expression trees blow up combinatorially —
  * the Horner references its argument once per level, the argument
  * references the reduced mantissa, and a COMPOSED call like
  * softplus = detLnDoubleGe1(1 + detExp(-z)) multiplied a ~100-node detExp
  * tree ~140×: q197 went to 217 s with a 273 MiB task binary on the r08
  * bring-up bench. Each of these is ONE tree node whose eval and codegen
  * call the static JVM reference implementations in [[DetMath]] — which
  * DetMathSpec proves BIT-IDENTICAL to the Column-tree forms (and hence to
  * the DuckDB SQL twins) over dense argument sweeps, so swapping the
  * internals changes no gated result.
  *
  * Codegen emits a static method call — the expression stays inside
  * whole-stage codegen (a JVM static call, same as many built-ins), and
  * evaluation does the ~40-flop loop once instead of re-evaluating shared
  * subtrees per Horner level.
  */
abstract class DetMathUnary extends UnaryExpression with Serializable {
  protected def fn: String // static method on graft.functions.DetMath
  protected def inType: DataType
  final override def dataType: DataType = DoubleType
  final override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == inType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${inType.catalogString}, got " +
        child.dataType.catalogString)
  final override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DetMath.$fn($c)")
}

/** Deterministic ln over BIGINT ≥ 1 (see DetMath.lnLong). */
case class DetLnLong(child: Expression) extends DetMathUnary {
  override protected def fn: String = "lnLong"
  override protected def inType: DataType = LongType
  override def prettyName: String = "graft_det_ln_long"
  override protected def nullSafeEval(x: Any): Any =
    DetMath.lnLong(x.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): DetLnLong =
    copy(child = c)
}

/** Deterministic e^x over DOUBLE, |x| ≤ ~86 (see DetMath.expDouble). */
case class DetExp(child: Expression) extends DetMathUnary {
  override protected def fn: String = "expDouble"
  override protected def inType: DataType = DoubleType
  override def prettyName: String = "graft_det_exp"
  override protected def nullSafeEval(x: Any): Any =
    DetMath.expDouble(x.asInstanceOf[Double])
  override protected def withNewChildInternal(c: Expression): DetExp =
    copy(child = c)
}

/** Deterministic ln over DOUBLE ∈ [1, 2^62) (see DetMath.lnDoubleGe1). */
case class DetLnDoubleGe1(child: Expression) extends DetMathUnary {
  override protected def fn: String = "lnDoubleGe1"
  override protected def inType: DataType = DoubleType
  override def prettyName: String = "graft_det_ln_ge1"
  override protected def nullSafeEval(x: Any): Any =
    DetMath.lnDoubleGe1(x.asInstanceOf[Double])
  override protected def withNewChildInternal(c: Expression): DetLnDoubleGe1 =
    copy(child = c)
}
