package graft.text

import graft.SparkSpec

/** q72 (BPE pair counts) and q73 (per-source quantile gate) against
  * brute-force Scala recomputation on the sf0.001 corpus — an engine-free
  * second opinion on top of the driver's DuckDB oracle. */
class TrainingDataOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q72 top-50 pair counts match a brute-force recount") {
    val texts = graft.analytics.Ops.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    for (t <- texts; pair <- t.split(" ", -1).sliding(2) if pair.length == 2)
      counts.update(pair.mkString(" "), counts.getOrElse(pair.mkString(" "), 0L) + 1L)
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)

    val got = graft.SparkEntry.queries("q72_bpe_pairs")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q75 merge table matches a brute-force greedy BPE train loop") {
    // greedy left-to-right non-overlapping merge — the reference semantics
    // q75's aggregate-fold must reproduce exactly
    def applyMerge(v: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) { out += (a + b); i += 2 }
        else { out += v(i); i += 1 }
      }
      out.result()
    }
    var seqs = graft.analytics.Ops.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0).split(" ", -1).toVector).toVector
    val expected = (1 to 3).map { step =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      for (sq <- seqs; i <- 0 until sq.length - 1) {
        val p = sq(i) + " " + sq(i + 1)
        counts.update(p, counts.getOrElse(p, 0L) + 1L)
      }
      val (pair, n) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val sp = pair.indexOf(' ')
      seqs = seqs.map(applyMerge(_, pair.substring(0, sp), pair.substring(sp + 1)))
      (step.toLong, pair, n)
    }

    val got = graft.SparkEntry.queries("q75_bpe_train")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got == expected)
  }

  test("q238 merge table matches a brute-force WordPiece train loop") {
    // identical greedy application to q75; only the SELECTION differs —
    // likelihood score n(ab)/(n(a)·n(b)) with min-support 2, score as a
    // single IEEE division of exact integers, ties on pair asc
    def applyMerge(v: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) { out += (a + b); i += 2 }
        else { out += v(i); i += 1 }
      }
      out.result()
    }
    var seqs = graft.analytics.Ops.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0).split(" ", -1).toVector).toVector
    val expected = (1 to 3).map { step =>
      val pc = new scala.collection.mutable.HashMap[String, Long]()
      val uc = new scala.collection.mutable.HashMap[String, Long]()
      for (sq <- seqs) {
        for (t <- sq) uc.update(t, uc.getOrElse(t, 0L) + 1L)
        for (i <- 0 until sq.length - 1) {
          val p = sq(i) + " " + sq(i + 1)
          pc.update(p, pc.getOrElse(p, 0L) + 1L)
        }
      }
      val (pair, n) = pc.toSeq.filter(_._2 >= 2L).minBy { case (p, c) =>
        val sp = p.indexOf(' ')
        val score = c.toDouble /
          (uc(p.substring(0, sp)) * uc(p.substring(sp + 1))).toDouble
        (-score, p)
      }
      val sp = pair.indexOf(' ')
      val (ca, cb) = (uc(pair.substring(0, sp)), uc(pair.substring(sp + 1)))
      seqs = seqs.map(applyMerge(_, pair.substring(0, sp), pair.substring(sp + 1)))
      (step.toLong, pair, n, ca, cb)
    }

    val got = graft.SparkEntry.queries("q238_wordpiece_train")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("q78 post-batch recount matches a brute-force batched-BPE replica") {
    val seqs = graft.analytics.Ops.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0).split(" ", -1).toVector)

    def countPairs(ss: Iterable[Vector[String]]): Map[String, Long] = {
      val m = new scala.collection.mutable.HashMap[String, Long]()
      for (sq <- ss; i <- 0 until sq.length - 1) {
        val p = sq(i) + " " + sq(i + 1)
        m.update(p, m.getOrElse(p, 0L) + 1L)
      }
      m.toMap
    }
    // greedy top-8 symbol-disjoint selection over the top-64 candidates
    val cands = countPairs(seqs).toSeq.sortBy { case (p, n) => (-n, p) }.take(64)
    val taken = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val used = scala.collection.mutable.HashSet.empty[String]
    for ((p, _) <- cands if taken.size < 8) {
      val i = p.indexOf(' ')
      val (a, b) = (p.substring(0, i), p.substring(i + 1))
      if (a != b && b.nonEmpty && !used(a) && !used(b)) {
        taken(a) = b; used += a; used += b
      }
    }
    assert(taken.size == 8, s"corpus should yield a full batch (got ${taken.size})")
    // simultaneous application (disjointness makes left-to-right == positional)
    def applyBatch(v: Vector[String]): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && taken.get(v(i)).contains(v(i + 1))) {
          out += (v(i) + v(i + 1)); i += 2
        } else { out += v(i); i += 1 }
      }
      out.result()
    }
    val expected = countPairs(seqs.map(applyBatch))
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)

    val got = graft.SparkEntry.queries("q78_bpe_batch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q132 per-doc encoded counts match a brute-force BPE encoder") {
    // replicate q75's training (already pinned above), then apply the
    // merges in order with the greedy left-to-right encoder and compare
    // per-doc raw/encoded token counts
    def applyMerge(v: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) { out += (a + b); i += 2 }
        else { out += v(i); i += 1 }
      }
      out.result()
    }
    val docs = graft.analytics.Ops.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toVector))
    var seqs = docs.map(_._2).toVector
    val merges = (1 to 3).map { _ =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      for (sq <- seqs; i <- 0 until sq.length - 1) {
        val p = sq(i) + " " + sq(i + 1)
        counts.update(p, counts.getOrElse(p, 0L) + 1L)
      }
      val (pair, _) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val sp = pair.indexOf(' ')
      val ab = (pair.substring(0, sp), pair.substring(sp + 1))
      seqs = seqs.map(applyMerge(_, ab._1, ab._2))
      ab
    }
    val expected = docs.map { case (id, tk) =>
      val enc = merges.foldLeft(tk) { case (v, (a, b)) => applyMerge(v, a, b) }
      id -> ((tk.length.toLong, enc.length.toLong))
    }.toMap

    val got = graft.SparkEntry.queries("q132_bpe_encode")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // the audit column is consistent by construction
    graft.SparkEntry.queries("q132_bpe_encode")(spark, sf).collect().foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
  }

  test("q73 keeps exactly the ntile-3/4 half per source, in tuple order") {
    val docs = graft.analytics.Ops.t(spark, sf, "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val kept = graft.SparkEntry.queries("q73_quantile_gate")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    for ((source, rows) <- docs.groupBy(_._2)) {
      val ordered = rows.sortBy(v => (v._3, v._1)) // (n_chars, doc_id)
      val n = ordered.length
      // ntile(4): first (n mod 4) buckets get ceil(n/4); keep buckets 3-4
      val sizes = (1 to 4).map(i => n / 4 + (if (i <= n % 4) 1 else 0))
      val expectKept = ordered.drop(sizes(0) + sizes(1)).map(_._1).toSet
      val gotKept = rows.filter(v => kept.contains((v._1, source))).map(_._1).toSet
      assert(gotKept == expectKept, s"source $source: kept set mismatch")
    }
    assert(kept.size == docs.groupBy(_._2).values
      .map { rows => val n = rows.length; n - (n / 4 * 2 +
        (if (n % 4 >= 1) 1 else 0) + (if (n % 4 >= 2) 1 else 0)) }.sum)
  }
  test("q247/q248 byte-level BPE matches a brute-force weighted train+encode") {
    // GPT-2 recipe replica: word-frequency table, hex byte symbols,
    // 3 greedy merges by (weighted count desc, pair asc), greedy
    // left-to-right application (same applyMerge contract as q75)
    def applyMerge(v: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) { out += (a + b); i += 2 }
        else { out += v(i); i += 1 }
      }
      out.result()
    }
    def hexSyms(w: String): Vector[String] =
      w.getBytes("UTF-8").toVector.map(b => f"${b & 0xff}%02X")
    val docs = graft.analytics.Ops.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty).toVector))
    val wc = new scala.collection.mutable.HashMap[String, Long]()
    for ((_, ws) <- docs; w <- ws) wc.update(w, wc.getOrElse(w, 0L) + 1L)
    var enc: Map[String, Vector[String]] =
      wc.keys.map(w => w -> hexSyms(w)).toMap
    val expectedMerges = (1 to 3).map { step =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      for ((w, syms) <- enc; i <- 0 until syms.length - 1) {
        val pr = syms(i) + " " + syms(i + 1)
        counts.update(pr, counts.getOrElse(pr, 0L) + wc(w))
      }
      val (pair, n) = counts.toSeq.minBy { case (pr, c) => (-c, pr) }
      val sp = pair.indexOf(' ')
      enc = enc.map { case (w, v) =>
        w -> applyMerge(v, pair.substring(0, sp), pair.substring(sp + 1)) }
      (step.toLong, pair, n)
    }
    val gotTrain = graft.SparkEntry.queries("q247_byte_bpe_train")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(gotTrain == expectedMerges)

    // encode parity: per-doc bytes / post-merge tokens / merges applied
    val expectedEnc = docs.map { case (id, ws) =>
      val nb = ws.map(_.getBytes("UTF-8").length.toLong).sum
      val nt = ws.map(w => enc(w).length.toLong).sum
      id -> ((nb, nt, nb - nt))
    }.toMap
    val gotEnc = graft.SparkEntry.queries("q248_byte_bpe_encode")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(gotEnc == expectedEnc)
  }
}
