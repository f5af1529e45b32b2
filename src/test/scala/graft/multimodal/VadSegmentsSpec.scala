package graft.multimodal

import graft.SparkSpec

/** q216 (VAD segmentation) on CONSTRUCTED PCM — the fixture corpus
  * exercises plain runs only (no 1-0-1 gap ever survives its phase
  * patterns), so the three rules that make VAD smoothing correct are
  * pinned here on real encoded WAV bytes through the production
  * decode → window → segment path ([[Multimodal.vadSegments]] is the
  * exact definition q216 runs):
  *  - HANGOVER BRIDGE: one inactive window between two active ones
  *    joins them into a single segment (n_windows > n_active);
  *  - NO BRIDGE over 2+ inactive windows: the run splits;
  *  - MIN-DURATION: islands with < 2 active windows drop, clips with
  *    only isolated activity emit nothing.
  * Active windows are amplitude-1000 (mean square 10⁶ ≥ 333000),
  * silent windows all-zero — decisively both sides of the threshold. */
class VadSegmentsSpec extends SparkSpec {

  private val Win = 80
  private val ActiveSq = 80L * 1000L * 1000L // per-window energy at amp 1000

  /** One sample block per pattern entry: 1 → 80×amp-1000, 0 → 80×0. */
  private def pcm(pattern: Seq[Int]): Array[Short] =
    pattern.flatMap(b => Array.fill(Win)(if (b == 1) 1000.toShort
      else 0.toShort)).toArray

  test("bridge, split, and min-duration rules on real WAV bytes") {
    import spark.implicits._
    val clips = Seq(
      1L -> Seq(1, 1, 0, 1, 1), // bridged: ONE segment spanning the dip
      2L -> Seq(1, 0, 0, 1, 1), // 2-gap: no bridge; lone head drops
      3L -> Seq(0, 1, 0, 0),    // isolated click: nothing survives
      4L -> Seq(1, 1))          // plain run
    val media = clips.map { case (id, p) =>
      Multimodal.MediaRow(id, "audio", WavCodec.encode(pcm(p), 8000))
    }.toDS()
    val out = Multimodal.vadSegments(
        Multimodal.audioEnergyWindows(media).toDF())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))

    assert(out === Seq(
      // clip 1: bridged — 5 windows, 4 active, dip contributes 0 energy
      (1L, 0L, 4L, 5L, 4L, 4 * ActiveSq),
      // clip 2: only the trailing [1,1] run survives the min-duration rule
      (2L, 3L, 4L, 2L, 2L, 2 * ActiveSq),
      // clip 3 emits nothing; clip 4 is the plain run
      (4L, 0L, 1L, 2L, 2L, 2 * ActiveSq)))
  }

  test("determinism and agreement with the q216 catalog query on the fixture") {
    val sf = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("q216_vad_segments")(spark, sf)
    val a = q.collect().map(_.toSeq).toSet
    val b = graft.SparkEntry.queries("q216_vad_segments")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // every segment is internally coherent
    a.foreach { r =>
      val (start, end) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])
      val (nw, na) = (r(3).asInstanceOf[Long], r(4).asInstanceOf[Long])
      assert(end - start + 1 == nw && na >= 2 && na <= nw)
    }
  }
}
