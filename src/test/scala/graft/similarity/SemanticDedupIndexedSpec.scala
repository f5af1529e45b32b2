package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q207 (index-served semantic dedup) vs q74 (inline-trained anchor).
  * [[SimilarityQueries.dominatedIn]] is shared verbatim, so the only
  * legitimate divergence is the quantizer (the persisted index trains 2
  * Lloyd iterations, q74 trains 1). Pinned invariants:
  *  - CLOSURE under the index cells: two q207 survivors sharing an index
  *    cell are never >= tau cosine-similar (exact, by construction);
  *  - every dropped vector has an earlier same-cell witness at >= tau;
  *  - survivor-set agreement with q74 >= 0.9 Jaccard (measured well
  *    above; cell boundaries move a little between quantizers, survivor
  *    sets barely);
  *  - plan: the within-cell candidate self-join reads the BUCKETED cells
  *    layout with zero shuffle on either join branch — the serving-path
  *    scale argument (corpus embeddings never move);
  *  - determinism across runs. */
class SemanticDedupIndexedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val tau = 0.35

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Array[Double], b: Array[Double]): Double =
    BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("closure + witness under the index cells; q74 parity floor; determinism") {
    val out = graft.SparkEntry.queries("q207_semantic_dedup_indexed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val (_, vName) = graft.IndexCache.ensure(spark, sf)
    val byCell = spark.table(s"${vName}_cells")
      .select("vec_id", "v", "cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))

    // survivors + dropped partition the corpus; reported cells match
    assert(out.keySet.subsetOf(byCell.map(_._1).toSet))
    val dropped = byCell.filterNot(v => out.contains(v._1))
    assert(out.size + dropped.length == byCell.length)
    assert(dropped.nonEmpty, "threshold produced no drops — spec has no teeth")
    val cells = byCell.groupBy(_._3)
    for ((cell, vs) <- cells) {
      val surv = vs.filter(v => out.contains(v._1)).sortBy(_._1)
      surv.foreach(v => assert(out(v._1) == cell, s"cell mismatch for ${v._1}"))
      for (i <- surv.indices; j <- (i + 1) until surv.length)
        assert(cos(surv(i)._2, surv(j)._2) < tau,
          s"survivors ${surv(i)._1}/${surv(j)._1} in cell $cell at >= $tau")
      // every dropped member of this cell has an earlier in-cell witness
      val all = vs.sortBy(_._1)
      for (v <- all if !out.contains(v._1))
        assert(all.exists(w => w._1 < v._1 && cos(w._2, v._2) >= tau),
          s"dropped ${v._1} has no earlier witness in cell $cell")
    }

    // parity floor vs the inline-trained anchor
    val anchor = graft.SparkEntry.queries("q74_semantic_dedup")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val jac = out.keySet.intersect(anchor).size.toDouble /
      out.keySet.union(anchor).size
    info(f"survivor-set Jaccard vs q74: $jac%.3f " +
      s"(indexed ${out.size}, inline ${anchor.size})")
    assert(jac >= 0.9, f"survivor agreement $jac%.3f below the 0.9 floor")

    // determinism
    val again = graft.SparkEntry.queries("q207_semantic_dedup_indexed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == out, "q207 is not deterministic across runs")
  }

  test("within-cell candidate join is exchange-free over the bucketed cells layout") {
    val (_, vName) = graft.IndexCache.ensure(spark, sf)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val assigned = spark.table(s"${vName}_cells")
        .select("vec_id", "v", "norm", "cell")
      val dom = SimilarityQueries.dominatedIn(assigned, tau)
      dom.collect() // materialize so executedPlan is the real one
      val smj = dom.queryExecution.executedPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(smj.nonEmpty, "expected a sort-merge join for the cell self-join")
      for (side <- Seq(smj.get.left, smj.get.right)) {
        assert(side.collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.bucketedScan => s }.nonEmpty,
          s"candidate-join side does not read the bucketed layout:\n$side")
        assert(side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.isEmpty,
          s"candidate-join side still shuffles:\n$side")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
