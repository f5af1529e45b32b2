package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the lake-operations catalog queries beyond the DuckDB
  * hash gate: determinism, structural properties of the PageRank and MMR
  * results, and snapshot/scratch idempotence (same run twice == same
  * output — the gate only sees one run). */
class LakeQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.QueryCatalog.all.find(_.name == name).get.fn(spark, sf)

  test("q123: rank floor, node coverage, and bit-identical re-runs") {
    val a = run("q123_event_pagerank").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = run("q123_event_pagerank").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b, "PageRank must be deterministic")
    val types = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(a.keySet === types)
    // damping base: every node holds at least the per-node base mass
    assert(a.values.forall(_ >= 150000L))
    // somebody must accumulate more than the base (the graph is nonempty)
    assert(a.values.exists(_ > 150000L))
  }

  test("q124: three distinct picks per query; first pick is the top-rel candidate") {
    val rows = run("q124_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQuery.foreach { case (q, picks) =>
      assert(picks.length === 3, s"query $q must pick exactly 3")
      assert(picks.map(_._3).distinct.length === 3,
        s"query $q picked a candidate twice")
      assert(picks.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L))
    }
    // MMR step 1 maximizes pure relevance — must agree with q40's top-1
    // for the shared query ids (q40 ranks by the same 6dp cosine)
    val q40top = graft.similarity.SimilarityQueries.defs
      .find(_.name == "q40_ann_topk").get.fn(spark, sf)
      .filter(col("rank") === 1 && col("query_id") < 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byQuery.foreach { case (q, picks) =>
      val first = picks.find(_._2 == 1L).get._3
      assert(first === q40top(q),
        s"query $q first MMR pick $first != top-rel ${q40top(q)}")
    }
  }

  test("q124: picked set is diverse — never two copies of one near-dup group") {
    // the embeddings corpus contains exact/near duplicates; plain top-3
    // would pick them together, MMR must not: assert pairwise cosine of
    // picks stays below the near-dup band (>= 0.999) for every query
    val picks = run("q124_mmr_rerank")
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    import spark.implicits._
    val pickDf = picks.toSeq.toDF("query_id", "vec_id")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    graft.functions.GraftFunctions.register(spark)
    val v = emb.join(pickDf, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
    val pairSims = v.as("a").join(v.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(expr("graft_dot(a.e, b.e) / (sqrt(graft_dot(a.e, a.e)) * sqrt(graft_dot(b.e, b.e)))").as("sim"))
      .collect().map(_.getDouble(0))
    assert(pairSims.nonEmpty)
    assert(pairSims.forall(_ < 0.999),
      s"MMR picked two near-identical vectors (max sim ${pairSims.max})")
  }

  test("q121/q125 scratch-writing queries are idempotent across runs") {
    val j1 = run("q121_json_interchange").collect().toSet
    val j2 = run("q121_json_interchange").collect().toSet
    assert(j1 === j2)
    val s1 = run("q125_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = run("q125_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
    // all four change classes present on this data
    assert(s1.keySet === Set("added", "removed", "changed", "unchanged"))
  }

  test("q127: merged incremental partials equal the one-shot full aggregate") {
    val full = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(to_date(col("l_shipdate")).as("ship_date"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("revenue"))
    val merged = run("q127_incremental_gold")
    assert(merged.unionAll(full).distinct().count() === full.count(),
      "incremental merge must be value-identical to the full recompute")
  }
}
