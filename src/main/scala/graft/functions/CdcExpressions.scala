package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of one document (the q220 rule) as a single
  * compiled expression: cut wherever the 8-character polynomial rolling
  * hash Σ_{j=0..7} code(i+j)·31^j is ≡ 0 (mod 64); emit
  * (chunk_idx, chunk_len, chunk_md5) per chunk.
  *
  * This replaces the higher-order-function chain the query previously
  * inlined (`filter(sequence(..), i -> aggregate(sequence(0,7), ...))`).
  * Spark evaluates lambda functions INTERPRETED, element by element —
  * O(8n) boxed integer ops plus a sequence allocation per position, the
  * dominant cost of q220/q221 at sf0.1 (guide §4: keep the hot path out
  * of non-codegen expression trees). Here the whole document is chunked
  * in one tight JVM loop, and the window hash is advanced INCREMENTALLY:
  * h(i)−code(i) is divisible by 31 exactly, so
  * h(i+1) = (h(i)−code(i))/31 + code(i+8)·31^7 — O(n) exact integer
  * arithmetic producing bit-identical breakpoints.
  *
  * Value parity with the legacy expression (and the DuckDB oracle) is
  * pinned by CdcChunksSpec on ASCII and multi-byte fixtures:
  *  - characters are CODE POINTS (what `split(text, '')` + `ascii` and
  *    `length`/`substring` count on both engines);
  *  - no modular reduction: max code point (0x10FFFF) × Σ31^j ≈ 3.2e16
  *    fits a long with headroom, exactly as the legacy BIGINT chain;
  *  - chunk_md5 = lowercase-hex md5 of the chunk's UTF-8 bytes, matching
  *    `md5(substring(text, start+1, len))`.
  *
  * CodegenFallback is deliberate: per-row work is O(doc length), so the
  * per-call fallback overhead is noise next to the compiled loop.
  */
case class CdcChunks(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_chunks requires a STRING input, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk_len", LongType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  // 31^0 .. 31^7 — the legacy expression's literal power array
  private val Pow7 = 27512614111L // 31^7

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val codes = s.codePoints().toArray
    val n = codes.length
    // breakpoints: window start i in [0, n-8] with h(i) % 64 == 0 cuts at
    // i+8 when that lands strictly inside the doc (the legacy
    // filter(.. x -> x < n) rule)
    val cuts = new java.util.ArrayList[Int]()
    if (n >= 8) {
      var h = 0L
      var j = 7
      while (j >= 0) { h = h * 31L + codes(j); j -= 1 } // Σ code(j)·31^j
      var i = 0
      while (i <= n - 8) {
        if (h % 64L == 0L) { val cut = i + 8; if (cut < n) cuts.add(cut) }
        if (i < n - 8) h = (h - codes(i)) / 31L + codes(i + 8) * Pow7
        i += 1
      }
    }
    buildChunks(s, n, cuts)
  }

  /** Chunks from the cut list: k in 0..cuts.size, start = prev cut (or 0),
    * end = next cut (or n); md5 over the chunk's UTF-8 bytes. */
  private def buildChunks(s: String, n: Int,
      cuts: java.util.ArrayList[Int]): GenericArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val nk = cuts.size() + 1
    val rows = new Array[Any](nk)
    var k = 0
    var startCp = 0
    var startChar = 0
    while (k < nk) {
      val endCp = if (k == cuts.size()) n else cuts.get(k)
      // code-point offsets -> char offsets for the Java substring
      val endChar = s.offsetByCodePoints(startChar, endCp - startCp)
      val bytes = s.substring(startChar, endChar)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      md.reset()
      val digest = md.digest(bytes)
      val hex = new java.lang.StringBuilder(32)
      var b = 0
      while (b < digest.length) {
        val v = digest(b) & 0xFF
        hex.append(Character.forDigit(v >>> 4, 16))
        hex.append(Character.forDigit(v & 0xF, 16))
        b += 1
      }
      rows(k) = InternalRow(k.toLong, (endCp - startCp).toLong,
        UTF8String.fromString(hex.toString))
      startCp = endCp
      startChar = endChar
      k += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
