package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force parity for the unigram-LM trainer (the q75 discipline):
  * an INDEPENDENT plain-Scala Viterbi + EM loop with the same integer
  * micro-unit arithmetic and tie-breaks re-derives the q233 trainer's
  * E-step counts and final vocab, and the q232 seed selection, from the
  * collected sf0.001 words. Any drift in the `aggregate`-HOF DP (bounds,
  * tie order, map probing) fails here before the driver gate runs. */
class UnigramLmSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ── independent reimplementation (no shared helpers) ────────────────

  /** Longest-piece-wins-on-tie Viterbi, positions ascending, candidates
    * longest-first with strict-> replacement — mirrors
    * [[UnigramLm.viterbiExpr]] by CONTRACT, not by code. */
  private def viterbiBrute(word: String,
      vocab: Map[String, Long]): Seq[String] = {
    val L = word.length
    val best = new Array[(Long, List[String])](L + 1)
    best(0) = (0L, Nil)
    for (i <- 1 to L) {
      var cur: (Long, List[String]) = null
      for (pl <- math.min(UnigramLm.MaxPieceLen, i) to 1 by -1) {
        vocab.get(word.substring(i - pl, i)).foreach { lp =>
          if (best(i - pl) != null) {
            val cand = (best(i - pl)._1 + lp,
              best(i - pl)._2 :+ word.substring(i - pl, i))
            if (cur == null || cand._1 > cur._1) cur = cand
          }
        }
      }
      best(i) = cur
    }
    if (best(L) == null) Seq.empty else best(L)._2
  }

  private def bruteCounts(words: Seq[(String, Long)],
      vocab: Map[String, Long]): Map[String, Long] =
    words.flatMap { case (w, c) => viterbiBrute(w, vocab).map(_ -> c) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }

  private def bruteLp(kept: Seq[String],
      uses: Map[String, Long]): Map[String, Long] = {
    // mirrors the r11-continuation DetMath switch: lnLong difference +
    // half-away-from-zero rounding (cross-engine portable, see
    // UnigramLm.smoothedLp)
    val total = kept.map(p => uses.getOrElse(p, 0L) + 1L).sum
    kept.map { p =>
      val v = (graft.functions.DetMath.lnLong(uses.getOrElse(p, 0L) + 1L)
        - graft.functions.DetMath.lnLong(total)) * 1e6
      p -> (math.floor(math.abs(v) + 0.5) * math.signum(v)).toLong
    }.toMap
  }

  private lazy val words: Seq[(String, Long)] =
    UnigramLm.wordCounts(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq

  private lazy val seedVocab: Map[String, Long] = {
    val alphabet = words.flatMap { case (w, c) => w.map(ch => ch.toString -> c) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val pieces = words.flatMap { case (w, c) =>
      (for {
        st <- 0 until w.length
        pl <- 2 to UnigramLm.MaxPieceLen
        if st + pl <= w.length
      } yield w.substring(st, st + pl)).map(_ -> c)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val top = pieces.toSeq
      .sortBy { case (p, n) => (-n * p.length, p) }
      .take(UnigramLm.SeedSize).toMap
    bruteLp((alphabet ++ top).keys.toSeq.sorted, alphabet ++ top)
  }

  test("q232 seed selection matches the brute-force substring census") {
    val got = UnigramLm.seedFrame(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val pieces = words.flatMap { case (w, c) =>
      (for {
        st <- 0 until w.length
        pl <- 2 to UnigramLm.MaxPieceLen
        if st + pl <= w.length
      } yield w.substring(st, st + pl)).map(_ -> c)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val want = pieces.toSeq
      .map { case (p, n) => (p, n, n * p.length) }
      .sortBy { case (p, _, sc) => (-sc, p) }
      .take(UnigramLm.SeedSize)
    assert(got == want)
  }

  test("Viterbi HOF E-step == brute-force DP on the corpus seed vocab") {
    val wc = UnigramLm.wordCounts(spark, sf)
    assert(UnigramLm.eStep(wc, seedVocab) == bruteCounts(words, seedVocab))
  }

  test("equal-score segmentations break to the LONGEST piece, deterministically") {
    import spark.implicits._
    // lp(ab) == lp(a)+lp(b): every segmentation of "abab" scores the
    // same, so the DP's candidate order (longest piece first, strict >
    // replacement) decides — [ab, ab], never [a, b, ...] mixtures
    val vocab = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L)
    val wc = Seq(("abab", 3L)).toDF("word", "cnt")
    assert(UnigramLm.eStep(wc, vocab) == Map("ab" -> 6L))
    assert(viterbiBrute("abab", vocab) == Seq("ab", "ab"))
  }

  test("chars-only coverage: a word with no multi-char pieces segments to chars") {
    import spark.implicits._
    val vocab = Map("x" -> -5L, "y" -> -7L)
    val wc = Seq(("xyx", 2L)).toDF("word", "cnt")
    assert(UnigramLm.eStep(wc, vocab) == Map("x" -> 4L, "y" -> 2L))
  }

  test("q233 trainer end-to-end == brute-force EM loop (rounds, prune set, final vocab)") {
    val rounds = 3
    var vocab = seedVocab
    var uses = Map.empty[String, Long]
    (1 to rounds).foreach { r =>
      uses = bruteCounts(words, vocab)
      val multi = vocab.keys.filter(_.length > 1).toSeq
      val keep: Set[String] =
        if (r == rounds) multi.toSet
        else multi.sortBy(p => (-uses.getOrElse(p, 0L), p))
          .take(math.ceil(multi.size * UnigramLm.KeepFraction).toInt).toSet
      val kept = vocab.keys.filter(p => p.length == 1 || keep(p)).toSeq.sorted
      vocab = bruteLp(kept, uses)
    }
    val want = vocab.keys.toSeq
      .map(p => (p, uses.getOrElse(p, 0L), vocab(p)))
      .sortBy { case (p, u, _) => (-u, p) }
    val got = UnigramLm.train(spark, sf, rounds)
    assert(got == want)
  }

  test("q236 encoder == brute-force per-doc Viterbi accounting") {
    // train with the brute loop (proven == train() above), then encode
    // every doc by brute Viterbi and compare the per-doc stats
    val rounds = 3
    var vocab = seedVocab
    var uses = Map.empty[String, Long]
    (1 to rounds).foreach { r =>
      uses = bruteCounts(words, vocab)
      val multi = vocab.keys.filter(_.length > 1).toSeq
      val keep: Set[String] =
        if (r == rounds) multi.toSet
        else multi.sortBy(p => (-uses.getOrElse(p, 0L), p))
          .take(math.ceil(multi.size * UnigramLm.KeepFraction).toInt).toSet
      vocab = bruteLp(
        vocab.keys.filter(p => p.length == 1 || keep(p)).toSeq.sorted, uses)
    }
    val pieceCount: Map[String, Long] =
      words.map { case (w, _) => w -> viterbiBrute(w, vocab).size.toLong }.toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val want = docs.map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val (ok, skipped) = ws.partition(_.length <= UnigramLm.MaxWordLen)
      val pieces = ok.map(pieceCount).sum
      val fert = if (ok.nonEmpty)
        Math.round(pieces * 1e6 / ok.length) / 1e6 else 0.0
      (id, ok.length.toLong, skipped.length.toLong, pieces, fert)
    }.sortBy(_._1).toSeq
    val got = graft.QueryCatalog.all.find(_.name == "q236_unigram_encode").get
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("property: random words/vocabs — HOF DP == brute DP (200 cases, seeded)") {
    // deterministic pseudo-random stress over the DP's edge shapes:
    // tie-heavy log-probs (small value set), piece lengths 1..4 racing,
    // repeated chars (KwKwK-ish words), and words at the length cap
    import spark.implicits._
    val rng = new scala.util.Random(0xC0FFEE)
    val alpha = "abcd"
    val cases = (1 to 200).map { i =>
      val len = 1 + rng.nextInt(UnigramLm.MaxWordLen)
      val word = Seq.fill(len)(alpha(rng.nextInt(alpha.length))).mkString
      // vocab: every char + a few random substrings, lp from a SMALL set
      // so equal-score ties are common (the tie-break is the risk)
      val pieces = alpha.map(_.toString).toSet ++
        Seq.fill(6) {
          val st = rng.nextInt(word.length)
          val pl = 2 + rng.nextInt(UnigramLm.MaxPieceLen - 1)
          word.substring(st, math.min(st + pl, word.length))
        }.filter(_.length >= 2)
      val vocab = pieces.map(p => p -> (-(1 + rng.nextInt(4)) * 10L)).toMap
      (i.toLong, word, vocab)
    }
    cases.foreach { case (id, word, vocab) =>
      val wc = Seq((word, 1L)).toDF("word", "cnt")
      val got = UnigramLm.eStep(wc, vocab)
      val want = bruteCounts(Seq(word -> 1L), vocab)
      assert(got == want, s"case $id word=$word vocab=$vocab")
    }
  }

  test("trainer output is bounded, non-empty, and covers the alphabet") {
    val out = UnigramLm.train(spark, sf, 2)
    val alphabet = words.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(out.nonEmpty && out.size <= UnigramLm.SeedSize + alphabet.size + 1)
    assert(alphabet.subsetOf(out.map(_._1).toSet),
      "single-char coverage must survive every prune")
  }
}
