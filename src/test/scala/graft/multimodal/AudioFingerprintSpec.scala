package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q223's fingerprint ([[Multimodal.audioFingerprints]]) on constructed
  * WAV bytes through the real decode path — the fixture's formula PCM
  * has low phase entropy (every clip finds near-dups there; the oracle
  * brute-force gate proves parity, not discrimination), so the
  * properties that make the fingerprint USEFUL are pinned here:
  * identity, gain-robustness, single-window locality, and separation of
  * genuinely different signals. */
class AudioFingerprintSpec extends SparkSpec {

  private val Win = 16

  /** One window per amplitude: amps(i) fills windows i with that value. */
  private def pcm(amps: Seq[Int]): Array[Short] =
    amps.flatMap(a => Array.fill(Win)(a.toShort)).toArray

  private def fps(clips: Seq[(Long, Seq[Int])]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val media = clips.map { case (id, amps) =>
      Multimodal.MediaRow(id, "audio", WavCodec.encode(pcm(amps), 8000))
    }.toDS()
    Multimodal.audioFingerprints(media)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  test("identity, gain-robustness, locality, separation") {
    val alt = Seq(1000, 500, 1000, 500, 1000, 500, 1000, 500)
    val out = fps(Seq(
      1L -> alt,                                  // A
      2L -> alt,                                  // B: exact copy
      3L -> alt.map(_ / 2),                       // C: uniform gain change
      4L -> (alt.init :+ 1100),                   // D: last window bumped
      5L -> Seq(100, 200, 300, 400, 500, 600, 700, 800))) // E: rising
    val (fa, na) = out(1L)
    assert(na == 7L, s"n_bits $na")
    // alternating H/L: rising exactly at odd deltas → bits 1010101₂ read
    // LSB-first from delta 0 (down) = 0b0101010
    assert(fa == Integer.parseInt("0101010", 2).toLong, s"fp $fa")
    assert(out(2L)._1 == fa, "exact copy must fingerprint identically")
    // one-window clip: no deltas exist → well-defined (0, 0) rather than
    // Spark's sequence(0,-1) = [0,-1] descending surprise (the guarded
    // path; the DuckDB oracle's empty range + COALESCE agrees)
    val one = fps(Seq(9L -> Seq(700)))
    assert(one(9L) == ((0L, 0L)), s"one-window clip: ${one(9L)}")
    assert(out(3L)._1 == fa, "uniform gain must not move any sign bit")
    assert(java.lang.Long.bitCount(out(4L)._1 ^ fa) == 1,
      "a last-window bump must flip exactly the final delta bit")
    val sep = java.lang.Long.bitCount(out(5L)._1 ^ fa)
    assert(sep >= 3, s"a monotone-rising signal must separate (hamming $sep)")
  }
}
