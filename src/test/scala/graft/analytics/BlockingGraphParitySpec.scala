package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** Independent brute-force parity for the blocking/graph/corpus-stats
  * batch (q137-q143): each query's distributed plan (pigeonhole blocking
  * joins, prefix-filter set-similarity join, support-thresholded triangle
  * join, broadcast vocab join, keyed stats aggs) is recomputed here by a
  * from-scratch Scala implementation over the collected sf0.001 tables —
  * different code path, same answer, set-exact. This is the in-repo twin
  * of the driver's DuckDB gate: the gate proves cross-engine SQL
  * equivalence, this suite proves the BLOCKING is lossless (the
  * brute-force all-pairs reference never runs in the shipped plans). */
class BlockingGraphParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** 60-bit md5 SimHash, reimplemented from scratch (java MessageDigest,
    * not Spark functions) — mirrors q138's portable-hash definition. */
  private def simhash(text: String): Long = {
    val votes = new Array[Int](60)
    text.split(" ", -1).foreach { tok =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      var i = 0
      while (i < 60) {
        votes(i) += (if (((h >> i) & 1L) == 1L) 1 else -1); i += 1
      }
    }
    (0 until 60).foldLeft(0L)((acc, i) =>
      if (votes(i) > 0) acc | (1L << i) else acc)
  }

  test("q138: block-pigeonhole pairs == brute-force Hamming<=3 over all n^2 pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> simhash(r.getString(1)))
    val brute = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
    val got = SparkEntry.queries("q138_simhash_blocks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, s"blocked=${got.size} brute=${brute.size}")
    assert(brute.size == 25) // sf0.001 golden — guards a silently-empty pass
  }

  test("q139: masked-blocking pairs == brute-force Hamming-1 over all name pairs") {
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_name").collect().map(_.getString(0))
    val brute = (for {
      a <- names; b <- names
      if a < b && a.length == b.length &&
        a.zip(b).count { case (x, y) => x != y } == 1
    } yield (a, b)).toSet
    val got = SparkEntry.queries("q139_typo_pairs")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == brute, s"blocked=${got.size} brute=${brute.size}")
    assert(brute.size == 1275)
  }

  test("q140: per-node triangle counts == brute-force over the thresholded graph") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val support = li.groupBy(_._1).values.flatMap { rows =>
      val ss = rows.map(_._2).sorted
      for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
    }.groupBy(identity).map { case (e, os) => e -> os.size }
    // iterator first: Map.collect over pair results would rebuild a MAP
    // (one edge per distinct u), silently dropping edges
    val edges = support.iterator
      .collect { case ((u, v), w) if w >= 25 => (u, v) }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
    for {
      x <- nodes; y <- nodes if x < y && edges((x, y))
      z <- nodes if y < z && edges((y, z)) && edges((x, z))
    } Seq(x, y, z).foreach(n => triCount(n) = triCount.getOrElse(n, 0L) + 1)
    val got = SparkEntry.queries("q140_triangles")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == triCount.toMap, s"got=${got.size} brute=${triCount.size}")
    assert(triCount.values.sum == 360) // sf0.001: complete K10 co-purchase graph
  }

  test("q137: per-source OOV == brute-force top-10 vocab recomputation") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val counts = rows.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length }
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(10).map(_._1).toSet
    val expect = rows.groupBy(_._1).map { case (src, rs) =>
      val toks = rs.flatMap(_._2)
      src -> ((toks.length.toLong, toks.count(t => !vocab(t)).toLong))
    }
    val got = SparkEntry.queries("q137_vocab_oov")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q141: prefix-filter join == brute-force all-pairs Jaccard >= 0.5") {
    def shingles(text: String): Set[String] = {
      val t = text.split(" ", -1)
      (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1)))
    val brute = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = (sa & sb).size; union = sa.size + sb.size - inter
      if union > 0 && inter.toDouble / union >= 0.5
    } yield (a, b, round6(inter.toDouble / union))).toSet
    val got = SparkEntry.queries("q141_setsim_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute, s"blocked=${got.size} brute=${brute.size}")
    assert(brute.size == 28) // sf0.001 golden — guards a silently-empty pass
  }

  test("q149: incremental delta-vs-base pairs == brute-force cross-set Jaccard >= 0.5") {
    def shingles(text: String): Set[String] = {
      val t = text.split(" ", -1)
      (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    def isDelta(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8"))
        .take(1).map(b => f"$b%02x").mkString <= "19"
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1)))
    val brute = (for {
      (a, sa) <- docs if !isDelta(a); (b, sb) <- docs if isDelta(b)
      inter = (sa & sb).size; union = sa.size + sb.size - inter
      if union > 0 && inter.toDouble / union >= 0.5
    } yield (a, b, round6(inter.toDouble / union))).toSet
    val got = SparkEntry.queries("q149_setsim_incremental")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute, s"blocked=${got.size} brute=${brute.size}")
    assert(brute.size == 5) // sf0.001 golden — guards a silently-empty pass
  }

  test("q142: PMI table == brute-force document co-occurrence recomputation") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getString(1).split(" ", -1).toSet)
    val n = rows.length.toLong
    val dfs = rows.flatten.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val cooc = rows.flatMap { s =>
      val ts = s.toSeq.sorted
      for (i <- ts.indices; j <- i + 1 until ts.length) yield (ts(i), ts(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val expect = cooc.iterator.collect { case ((a, b), nab) if nab >= 5 =>
      (a, b, nab, round6(math.log(nab.toDouble * n / (dfs(a) * dfs(b)).toDouble)))
    }.toSet
    val got = SparkEntry.queries("q142_pmi")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expect, s"got=${got.size} brute=${expect.size}")
  }

  test("q151: a shared token run is caught at ANY offset (winnowing guarantee)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    // the same 20-token run embedded at offset 3 in doc 0 and offset 9 in
    // doc 1 — fixed-boundary segmenting (q130's 8-token grid) would see
    // disjoint segments; winnowing guarantees shared fingerprints for any
    // shared run of >= 7 tokens regardless of offset
    val run = (1 to 20).map(i => s"run$i").mkString(" ")
    val docs = Seq(
      (0L, s"alpha beta gamma $run tail0a tail0b", "en", "s", 0L),
      (1L, s"p1 p2 p3 p4 p5 p6 p7 p8 p9 $run other trailing words", "en", "s", 0L),
      (2L, (1 to 40).map(i => s"z$i").mkString(" "), "en", "s", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val pairs = SparkEntry.queries("q151_winnowing")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)),
      s"offset-shifted shared run not detected: $pairs")
    assert(pairs((0L, 1L)) >= 2)
    assert(pairs.size == 1, s"unrelated docs must not pair: $pairs")
  }

  test("q143: dataset card == brute-force per-source recomputation") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val expect = rows.groupBy(_._1).map { case (src, rs) =>
      val nDocs = rs.length.toLong
      val langC = rs.groupBy(_._3).map { case (_, xs) => xs.length.toLong }
      val entNano = langC.map { c =>
        val p = c.toDouble / nDocs
        math.round(-p * math.log(p) * 1e9)
      }.sum
      src -> ((nDocs,
        rs.map(_._2.split(" ", -1).length.toLong).sum,
        rs.map(_._4).sum,
        langC.size.toLong,
        nDocs - rs.map(_._2).distinct.length.toLong,
        entNano))
    }
    val got = SparkEntry.queries("q143_dataset_card")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect)
  }
}
