package graft.text

import graft.SparkSpec

/** q79 (token-budget mixture sampling), q80 (composed curation manifest)
  * and q81 (per-cluster canonical election) against engine-free brute-force
  * Scala replicas on the sf0.001 corpus — a second opinion on top of the
  * driver's DuckDB oracle, pinning the SEMANTICS (budget-crossing doc kept,
  * first-failing-gate labeling, ntile bucket arithmetic, longest-wins
  * election) rather than just engine agreement. */
class CurationPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private case class Doc(id: Long, source: String, nChars: Long, text: String) {
    val toks: Vector[String] = text.split(" ", -1).toVector.filter(_.nonEmpty)
    def nTokens: Long = toks.length.toLong
  }

  private def docs(): Vector[Doc] =
    graft.analytics.Ops.t(spark, sf, "documents")
      .select("doc_id", "source", "n_chars", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toVector

  test("q79 keeps exactly the hash-order prefix that fills each source's token budget") {
    val byDoc = docs()
    def budget(source: String): Long =
      (source.drop(3).toInt % 4) match {
        case 0 => 900L; case 1 => 700L; case 2 => 500L; case _ => 300L
      }
    val expected = byDoc.groupBy(_.source).toSeq.flatMap { case (src, ds) =>
      val ordered = ds.sortBy(d => (md5hex(d.id.toString), d.id))
      var cum = 0L
      ordered.flatMap { d =>
        val before = cum
        cum += d.nTokens
        // keep while the budget was not yet met BEFORE this doc — the
        // budget-crossing doc is included
        if (before < budget(src)) Some((d.id, src, d.nTokens, cum)) else None
      }
    }.toSet

    val got = graft.SparkEntry.queries("q79_token_budget_mix")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)

    // every source is represented and either took all docs or met its budget
    val perSource = got.groupBy(_._2)
    assert(perSource.keySet == byDoc.map(_.source).toSet)
    perSource.foreach { case (src, rows) =>
      val totalDocs = byDoc.count(_.source == src)
      val keptSum = rows.toSeq.map(_._3).sum // toSeq: Set would collapse equal counts
      assert(rows.size == totalDocs || keptSum >= budget(src),
        s"$src kept ${rows.size}/$totalDocs docs but only $keptSum tokens of ${budget(src)}")
    }
  }

  /** ntile(k) replication: first (n % k) buckets get (n/k + 1) rows. */
  private def ntileOf(pos: Int, n: Int, k: Int): Int = {
    val big = n / k + 1; val nBig = n % k
    if (pos < nBig * big) pos / big + 1
    else nBig + (pos - nBig * big) / (n / k) + 1
  }

  test("q80 per-source outcome counts match a first-failing-gate replica") {
    val ds = docs()
    val fp = ds.map(d => d.id -> md5hex(d.toks.take(3).mkString(" "))).toMap
    val rn = ds.groupBy(d => fp(d.id)).values.flatMap { g =>
      g.sortBy(_.id).zipWithIndex.map { case (d, i) => d.id -> (i + 1) }
    }.toMap
    val eligible = ds.map(d => d.id -> (rn(d.id) == 1 && d.nTokens >= 15)).toMap
    val quartile = ds.groupBy(d => (d.source, eligible(d.id))).values.flatMap { g =>
      val ordered = g.sortBy(d => (d.nChars, d.id))
      ordered.zipWithIndex.map { case (d, i) =>
        d.id -> ntileOf(i, ordered.length, 4)
      }
    }.toMap
    val status = ds.map { d =>
      d.id -> (if (rn(d.id) > 1) "dup"
               else if (d.nTokens < 15) "short"
               else if (quartile(d.id) == 1) "quality"
               else "kept")
    }.toMap
    val expected = ds.groupBy(_.source).map { case (src, g) =>
      (src,
        g.count(d => status(d.id) == "kept").toLong,
        g.count(d => status(d.id) == "dup").toLong,
        g.count(d => status(d.id) == "short").toLong,
        g.count(d => status(d.id) == "quality").toLong,
        g.filter(d => status(d.id) == "kept").map(_.nTokens).sum)
    }.toSet

    val got = graft.SparkEntry.queries("q80_curation_pipeline")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)

    // outcome mix is a partition of each source's documents
    got.foreach { case (src, kept, dup, short, qual, _) =>
      assert(kept + dup + short + qual == ds.count(_.source == src).toLong, src)
    }
  }

  test("q81 elects the longest member of every exact near-dup cluster") {
    val ds = docs()
    def grams(d: Doc): Set[String] = {
      val tk = d.text.split(" ", -1)
      (1 until math.max(tk.length - 1, 1)).map { i =>
        // mirrors the q38/q57 oracle's 1-based list_transform window (the
        // final short gram at the boundary included, DuckDB [] semantics)
        def at(j: Int) = if (j <= tk.length) tk(j - 1) else ""
        s"${at(i)} ${at(i + 1)} ${at(i + 2)}"
      }.toSet
    }
    val g = ds.map(d => d.id -> grams(d)).toMap
    val pairs = for {
      a <- ds; b <- ds
      if a.source == b.source && a.id < b.id
      inter = (g(a.id) & g(b.id)).size
      uni = g(a.id).size + g(b.id).size - inter
      if uni > 0 && inter.toDouble / uni >= 0.6
    } yield (a.id, b.id)
    // union-find over the exact pairs
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find)
    val nChars = ds.map(d => d.id -> d.nChars).toMap
    val expected = members.map { case (root, ms) =>
      val canonical = ms.minBy(id => (-nChars(id), id))
      (root, canonical, ms.size.toLong)
    }.toSet

    val got = graft.SparkEntry.queries("q81_cluster_canonical")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("q83 negative pairs: 2 per anchor, all cross-source, reproducible") {
    val ds = docs()
    val srcOf = ds.map(d => d.id -> d.source).toMap
    def run(): Set[(Long, Long, Long)] =
      graft.SparkEntry.queries("q83_negative_pairs")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pairs = run()
    assert(pairs.size == ds.size * 2, "every anchor draws exactly 2 negatives")
    assert(pairs.groupBy(_._1).keySet == ds.map(_.id).toSet)
    pairs.foreach { case (a, n, _) =>
      assert(srcOf(a) != srcOf(n), s"pair ($a, $n) is same-source")
    }
    // target docs serve a balanced number of anchors (ring property):
    // with equal source sizes every doc appears as a negative exactly twice
    val usage = pairs.toSeq.groupBy(_._2).values.map(_.size).toSet
    assert(usage == Set(2), s"negative usage unbalanced: $usage")
    assert(run() == pairs, "pairing must be reproducible across runs")
  }

  test("q84 chunks tile every document: contiguous ids, full coverage, exact overlap") {
    val ds = docs()
    val byDoc = graft.SparkEntry.queries("q84_doc_chunks")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(byDoc.keySet == ds.filter(_.nTokens > 0).map(_.id).toSet)
    ds.filter(_.nTokens > 0).foreach { d =>
      val chunks = byDoc(d.id).sortBy(_._2)
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong),
        s"doc ${d.id}: chunk ids not contiguous")
      chunks.foreach { case (_, cid, n, text) =>
        val start = (cid * 30).toInt
        val expectTokens = d.toks.slice(start, start + 40)
        assert(n == expectTokens.length && text == expectTokens.mkString(" "),
          s"doc ${d.id} chunk $cid: content mismatch")
      }
      // the last chunk reaches the end of the doc
      val (_, lastId, lastN, _) = chunks.last
      assert(lastId * 30 + lastN == d.nTokens,
        s"doc ${d.id}: coverage stops short of the last token")
    }
  }
}
