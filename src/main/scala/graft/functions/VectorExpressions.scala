package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two ArrayType(DoubleType) columns.
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`
  * in the similarity hot path: the higher-order-function form interprets a
  * lambda per element per row (no whole-stage codegen), while this compiles
  * to a tight primitive loop inside the generated code — the difference is
  * ~50× on the all-pairs cosine join.
  *
  * Summation order is the same sequential left-to-right fold as the HOF
  * form and DuckDB's list_dot_product, so results stay bit-identical to the
  * DuckDB oracle.
  *
  * Null contract: null input array → null; elements are assumed non-null
  * (embedding vectors) — matching zip_with/aggregate on non-null data.
  *
  * Length contract: inputs are assumed EQUAL-LENGTH (vectors of one
  * embedding space); mismatched lengths are truncated to the shorter —
  * unlike the zip_with/aggregate form, which null-pads and yields NULL.
  * The bit-identical-equivalence claim holds only for equal lengths.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be ArrayType(DoubleType); call sites (GraftFunctions /
  // SimilarityQueries) guarantee it, and resolution fails fast otherwise.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Cardinality of the intersection of two SORTED, distinct array<bigint>
  * columns, via a codegen'd two-pointer merge — O(n+m) primitive-long
  * comparisons per pair instead of `size(array_intersect(...))`'s hash-set
  * of objects. Used by the n-gram Jaccard join after shingles are hashed
  * (once per document) to sorted long arrays.
  *
  * Contract: inputs ascending-sorted and duplicate-free (produced by
  * sort_array(array_distinct(...))); elements non-null.
  */
case class SortedLongIntersectCard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_intersect_card requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_intersect_card"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val m = ctx.freshName("m"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCard =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native SQL functions. Idempotent —
  * query functions call this on whatever session the driver hands them. */
object GraftFunctions {
  private val builders: Map[String, Seq[Expression] => Expression] = Map(
    "graft_dot" -> { exprs =>
      require(exprs.length == 2, "graft_dot(a, b) takes two arrays")
      DotProduct(exprs(0), exprs(1))
    },
    "graft_intersect_card" -> { exprs =>
      require(exprs.length == 2, "graft_intersect_card(a, b) takes two arrays")
      SortedLongIntersectCard(exprs(0), exprs(1))
    },
    "graft_md5_sig16" -> { exprs =>
      require(exprs.length == 1, "graft_md5_sig16(gram) takes one STRING")
      Md5Sig16(exprs(0))
    },
    "graft_cdc_chunks" -> { exprs =>
      require(exprs.length == 1, "graft_cdc_chunks(text) takes one STRING")
      CdcChunks(exprs(0))
    },
    "graft_winnow_fps" -> { exprs =>
      require(exprs.length == 1, "graft_winnow_fps(tokens) takes one ARRAY<STRING>")
      WinnowFps(exprs(0))
    },
    "graft_bpe_apply" -> { exprs =>
      require(exprs.length == 2,
        "graft_bpe_apply(tk, merges) takes a symbol array and a literal merge array")
      BpeApplyMerges(exprs(0), exprs(1))
    },
    "graft_byte_bpe_encode" -> { exprs =>
      require(exprs.length == 2,
        "graft_byte_bpe_encode(word, merges) takes a word and a literal merge array")
      ByteBpeEncode(exprs(0), exprs(1))
    },
    "graft_zorder" -> { exprs =>
      require(exprs.length == 2, "graft_zorder(a, b) takes two BIGINT keys")
      ZOrder2(exprs(0), exprs(1))
    },
    "graft_det_ln_long" -> { exprs =>
      require(exprs.length == 1, "graft_det_ln_long(x) takes one BIGINT")
      DetLnLong(exprs(0))
    },
    "graft_det_exp" -> { exprs =>
      require(exprs.length == 1, "graft_det_exp(x) takes one DOUBLE")
      DetExp(exprs(0))
    },
    "graft_det_ln_ge1" -> { exprs =>
      require(exprs.length == 1, "graft_det_ln_ge1(w) takes one DOUBLE")
      DetLnDoubleGe1(exprs(0))
    },
    "graft_bloom_contains" -> { exprs =>
      require(exprs.length == 2,
        "graft_bloom_contains(key, bloomBytes) takes a key and a foldable binary sketch")
      require(exprs(1).foldable,
        "graft_bloom_contains: the sketch argument must be a literal (fold the " +
          "serialized BloomFilter in as lit(bytes))")
      BloomMightContain(exprs(0),
        exprs(1).eval().asInstanceOf[Array[Byte]])
    },
    "graft_kll_agg" -> { exprs =>
      require(exprs.length == 2, "graft_kll_agg(x, k) takes a value and a literal k")
      KllSketchAgg(exprs(0), foldableInt(exprs(1), "graft_kll_agg"))
    },
    "graft_kll_union" -> { exprs =>
      require(exprs.length == 2, "graft_kll_union(blob, k) takes a blob and a literal k")
      KllUnionAgg(exprs(0), foldableInt(exprs(1), "graft_kll_union"))
    },
    "graft_kll_quantiles" -> { exprs =>
      require(exprs.length == 2,
        "graft_kll_quantiles(blob, ranks) takes a blob and an ARRAY<DOUBLE> of ranks")
      KllQuantiles(exprs(0), exprs(1))
    },
    "graft_kll_n" -> { exprs =>
      require(exprs.length == 1, "graft_kll_n(blob) takes one blob")
      KllN(exprs(0))
    },
    "graft_theta_agg" -> { exprs =>
      require(exprs.length == 2,
        "graft_theta_agg(x, nomEntries) takes a value and a literal nomEntries")
      ThetaSketchAgg(exprs(0), foldableInt(exprs(1), "graft_theta_agg"))
    },
    "graft_theta_union" -> { exprs =>
      require(exprs.length == 2,
        "graft_theta_union(blob, nomEntries) takes a blob and a literal nomEntries")
      ThetaUnionAgg(exprs(0), foldableInt(exprs(1), "graft_theta_union"))
    },
    "graft_theta_intersect" -> { exprs =>
      require(exprs.length == 2,
        "graft_theta_intersect(blob, nomEntries) takes a blob and a literal nomEntries")
      ThetaIntersectAgg(exprs(0), foldableInt(exprs(1), "graft_theta_intersect"))
    },
    "graft_theta_intersect2" -> { exprs =>
      require(exprs.length == 2, "graft_theta_intersect2(a, b) takes two blobs")
      ThetaIntersect2(exprs(0), exprs(1))
    },
    "graft_theta_anotb" -> { exprs =>
      require(exprs.length == 2, "graft_theta_anotb(a, b) takes two blobs")
      ThetaANotB(exprs(0), exprs(1))
    },
    "graft_theta_estimate" -> { exprs =>
      require(exprs.length == 1, "graft_theta_estimate(blob) takes one blob")
      ThetaEstimate(exprs(0))
    },
    "graft_nfc" -> { exprs =>
      require(exprs.length == 1, "graft_nfc(s) takes one STRING")
      NfcNormalize(exprs(0))
    },
    "graft_nfkc" -> { exprs =>
      require(exprs.length == 1, "graft_nfkc(s) takes one STRING")
      NfkcNormalize(exprs(0))
    })

  /** Extract a foldable INT parameter (e.g. a sketch's k) at plan time. */
  private def foldableInt(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: the k argument must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: k must be an integer literal, got $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
