package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] sketch, as a native
  * codegen expression: `graft_bloom_contains(key, bloomBytes)`.
  *
  * The 100 TB pattern this enables (see [[graft.operators.BloomPrune]]):
  * when the build side of a semi join is too large to broadcast as an exact
  * key set but its BLOOM SKETCH (a few MB of bits for tens of millions of
  * keys at 1% fpp) still fits, prefilter the probe side BEFORE its shuffle.
  * Shuffle volume drops by the join selectivity; the exact join afterwards
  * removes the sketch's false positives, so results are exact.
  *
  * The sketch is carried as a constructor field (not a child Literal), so
  * plan strings stay readable and the deserialized filter ships once per
  * task via the codegen references array — `mightContainLong` is then two
  * hash probes per row inside whole-stage codegen, no per-row
  * deserialization.
  *
  * Null contract: null key → null (standard unary null propagation); the
  * sketch bytes are required non-null at construction.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  require(bloomBytes != null && bloomBytes.nonEmpty,
    "graft_bloom_contains: empty bloom filter bytes")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires a BIGINT key, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  // One deserialization per (driver codegen | executor task instance).
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(k: Any): Any =
    bloom.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $ref.mightContainLong($k);")
  }

  // Keep toString/plan output compact: never print the sketch bytes.
  override def flatArguments: Iterator[Any] = Iterator(child)
  override def toString: String =
    s"graft_bloom_contains($child, <${bloomBytes.length}B sketch>)"

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
