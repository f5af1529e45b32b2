package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The md5-portable MinHash slot bank of one gram, as ONE compiled
  * expression: element j (0-based, K = 16 slots) is
  * `CAST(CONV(SUBSTRING(MD5(gram || ':' || j), 1, 15), 16, 10) AS BIGINT)`
  * — the top 60 bits of md5(gram ++ ":j") — exactly the per-slot hash
  * [[graft.dedup.DedupQueries.md5Signatures]] previously built from 16
  * separate md5/substring/conv expression chains per gram occurrence.
  *
  * Why compiled: the chain form paid, PER SLOT, a fresh MessageDigest, a
  * concat allocation, a 32-char hex materialization and a base-16 string
  * parse — 16× per exploded gram row, the dominant stage of q36b/q107b
  * (guide §1.2 per-task work). Here the gram's UTF-8 bytes convert once,
  * one MessageDigest instance serves all 16 salted digests, and the
  * 60-bit value reads directly off the first 8 digest bytes
  * (big-endian >>> 4 == the 15-hex-char prefix parsed base-16).
  *
  * Value parity with the legacy chain is pinned by Md5Sig16Spec on the
  * fixture corpus and unicode edge strings; the DuckDB oracle twin
  * (md5SigSql) is unchanged — both engines still compute the identical
  * slot values.
  */
case class Md5Sig16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_md5_sig16 requires a STRING input, got ${other.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_md5_sig16"

  private val K = 16
  // ":0" .. ":15" as pre-encoded UTF-8 salts
  private val Salts: Array[Array[Byte]] =
    (0 until K).map(j => s":$j".getBytes(
      java.nio.charset.StandardCharsets.UTF_8)).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val gram = input.asInstanceOf[UTF8String].getBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](K)
    var j = 0
    while (j < K) {
      md.reset()
      md.update(gram)
      md.update(Salts(j))
      val dg = md.digest()
      // first 15 hex chars parsed base-16 == first 60 bits of the digest
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (dg(b) & 0xFFL); b += 1 }
      out(j) = v >>> 4
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Sig16 =
    copy(child = newChild)
}
