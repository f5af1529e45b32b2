package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available to ANY session via config, with no code changes:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * The same builders back [[GraftFunctions.register]], which is the
  * in-process path used by the query catalog; this class is the deployment
  * path for clusters where the session is constructed by infrastructure.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot(a, b) takes two arrays")
        DotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_intersect_card"),
      new ExpressionInfo(classOf[SortedLongIntersectCard].getName, "graft_intersect_card"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_intersect_card(a, b) takes two arrays")
        SortedLongIntersectCard(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_sig16"),
      new ExpressionInfo(classOf[Md5Sig16].getName, "graft_md5_sig16"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_md5_sig16(gram) takes one STRING")
        Md5Sig16(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_cdc_chunks(text) takes one STRING")
        CdcChunks(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "graft_winnow_fps"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_winnow_fps(tokens) takes one ARRAY<STRING>")
        WinnowFps(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_apply"),
      new ExpressionInfo(classOf[BpeApplyMerges].getName, "graft_bpe_apply"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "graft_bpe_apply(tk, merges) takes a symbol array and a literal merge array")
        BpeApplyMerges(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_byte_bpe_encode"),
      new ExpressionInfo(classOf[ByteBpeEncode].getName, "graft_byte_bpe_encode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "graft_byte_bpe_encode(word, merges) takes a word and a literal merge array")
        ByteBpeEncode(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_det_ln_long"),
      new ExpressionInfo(classOf[DetLnLong].getName, "graft_det_ln_long"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_det_ln_long(x) takes one BIGINT")
        DetLnLong(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_det_exp"),
      new ExpressionInfo(classOf[DetExp].getName, "graft_det_exp"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_det_exp(x) takes one DOUBLE")
        DetExp(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_det_ln_ge1"),
      new ExpressionInfo(classOf[DetLnDoubleGe1].getName, "graft_det_ln_ge1"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_det_ln_ge1(w) takes one DOUBLE")
        DetLnDoubleGe1(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrder2].getName, "graft_zorder"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_zorder(a, b) takes two BIGINT keys")
        ZOrder2(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_kll_agg(x, k) takes a value and a literal k")
        KllSketchAgg(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_union"),
      new ExpressionInfo(classOf[KllUnionAgg].getName, "graft_kll_union"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_kll_union(blob, k) takes a blob and a literal k")
        KllUnionAgg(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantiles].getName, "graft_kll_quantiles"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "graft_kll_quantiles(blob, ranks) takes a blob and an ARRAY<DOUBLE> of ranks")
        KllQuantiles(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_n"),
      new ExpressionInfo(classOf[KllN].getName, "graft_kll_n"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_kll_n(blob) takes one blob")
        KllN(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "graft_bloom_contains(key, bloomBytes) takes a key and a foldable binary sketch")
        require(exprs(1).foldable,
          "graft_bloom_contains: the sketch argument must be a literal")
        BloomMightContain(exprs(0), exprs(1).eval().asInstanceOf[Array[Byte]])
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_agg"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "graft_theta_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_theta_agg(x, nomEntries) takes a value and a literal nomEntries")
        ThetaSketchAgg(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_union"),
      new ExpressionInfo(classOf[ThetaUnionAgg].getName, "graft_theta_union"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_theta_union(blob, nomEntries) takes a blob and a literal nomEntries")
        ThetaUnionAgg(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_intersect"),
      new ExpressionInfo(classOf[ThetaIntersectAgg].getName, "graft_theta_intersect"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_theta_intersect(blob, nomEntries) takes a blob and a literal nomEntries")
        ThetaIntersectAgg(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_intersect2"),
      new ExpressionInfo(classOf[ThetaIntersect2].getName, "graft_theta_intersect2"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_theta_intersect2(a, b) takes two blobs")
        ThetaIntersect2(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_anotb"),
      new ExpressionInfo(classOf[ThetaANotB].getName, "graft_theta_anotb"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_theta_anotb(a, b) takes two blobs")
        ThetaANotB(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_estimate"),
      new ExpressionInfo(classOf[ThetaEstimate].getName, "graft_theta_estimate"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_theta_estimate(blob) takes one blob")
        ThetaEstimate(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_nfc(s) takes one STRING")
        NfcNormalize(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfkc"),
      new ExpressionInfo(classOf[NfkcNormalize].getName, "graft_nfkc"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_nfkc(s) takes one STRING")
        NfkcNormalize(exprs(0))
      }))
  }
}
