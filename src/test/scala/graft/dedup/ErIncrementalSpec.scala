package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The within-delta ER residual, EXERCISED (r07's "What's missing #3"):
  * q196's batch cannot contain internal dups by construction, so its
  * deferred composition (base absorption + q194's operators on the
  * residual) was asserted, never run. q196b constructs a batch WITH
  * internal Hamming-1 pairs; this spec pins the three-way partition and
  * the cluster algebra of the merged pairs. */
class ErIncrementalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val rows =
    graft.SparkEntry.queries("q196b_er_dirty_batch")(spark, sf)
      .collect()

  test("all three outcome classes are present in the dirty batch") {
    val inherits = rows.count(r => r.getAs[Long]("matched") == 1L)
    val foundsNew = rows.count(r => r.getAs[Long]("is_new") == 1L &&
      r.getAs[Long]("merged_in_delta") == 0L)
    val merged = rows.count(r => r.getAs[Long]("merged_in_delta") == 1L)
    assert(inherits > 0, "no record inherited a base cluster")
    assert(foundsNew > 0, "no record founded a new singleton entity")
    assert(merged > 0, "no within-delta merge happened — the batch is not dirty")
    // the dirty pairs come in twos: every merged component here is a pair
    assert(merged % 2 == 0, s"merged count $merged not pair-shaped")
  }

  test("merged within-delta pairs share one cluster = min member rec_id") {
    val merged = rows.filter(_.getAs[Long]("merged_in_delta") == 1L)
    val byCluster = merged.groupBy(_.getAs[Long]("assigned_cluster"))
    byCluster.foreach { case (cid, members) =>
      assert(members.length == 2,
        s"cluster $cid has ${members.length} members, expected the dirty pair")
      assert(members.map(_.getAs[Long]("rec_id")).min == cid,
        s"cluster id $cid is not the min member rec_id")
      // both records belong to the same (new) entity — purity by design
      assert(members.map(_.getAs[Long]("entity_key")).distinct.length == 1,
        s"cluster $cid merged records of different entities")
    }
  }

  test("matched records inherit a BASE cluster; founders cluster to themselves") {
    rows.foreach { r =>
      val rid = r.getAs[Long]("rec_id")
      val cl = r.getAs[Long]("assigned_cluster")
      if (r.getAs[Long]("matched") == 1L)
        assert(cl % 2 == 0 && cl < 1000000000L,
          s"matched $rid assigned non-base cluster $cl")
      else if (r.getAs[Long]("merged_in_delta") == 0L)
        assert(cl == rid, s"singleton founder $rid got cluster $cl")
    }
  }
}
