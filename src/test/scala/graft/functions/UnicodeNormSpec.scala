package graft.functions

import graft.SparkSpec
import graft.text.TextClean
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** UAX #15 conformance for the graft_nfc / graft_nfkc expressions
  * (VERDICT r11 punch #3): composition, singletons, Hangul, canonical
  * reordering, the NFKC compatibility folds (width forms, ligatures,
  * superscripts), the ASCII fast path, null safety, and the PREMISE the
  * tokenizer-trainer wiring stands on: the fixture corpus is pure
  * ASCII, so NFKC-first training is gate-identical to raw training.
  *
  * Every non-ASCII char is a \uXXXX escape, never a literal glyph:
  * composed and decomposed forms are visually identical in source. */
class UnicodeNormSpec extends SparkSpec {

  // decomposed / compatibility inputs
  private val eAcuteD   = "e\u0301"        // e + COMBINING ACUTE
  private val eAcuteC   = "\u00E9"         // precomposed
  private val aRingD    = "A\u030A"        // A + COMBINING RING ABOVE
  private val aRingC    = "\u00C5"         // precomposed
  private val angstrom  = "\u212B"         // ANGSTROM SIGN (NFC singleton)
  private val hangulD   = "\u1100\u1161"   // jamo pair
  private val hangulC   = "\uAC00"         // precomposed syllable
  // a + grave-below (ccc 220) + acute (ccc 230): already canonical ORDER;
  // NFC composes the acute across the lower-class mark -> a-acute + U+0316
  private val marksOrdered   = "a\u0316\u0301"
  private val marksReversed  = "a\u0301\u0316" // must reorder first
  private val marksNfc       = "\u00E1\u0316"

  private def runNfc(s: String): String = evalCol(TextClean.nfc(col("s")), s)
  private def runNfkc(s: String): String = evalCol(TextClean.nfkc(col("s")), s)
  private def evalCol(c: org.apache.spark.sql.Column, s: String): String = {
    import spark.implicits._
    Seq(s).toDF("s").select(c.as("r")).collect()(0).getString(0)
  }

  test("NFC: composition, singleton, Hangul, canonical reordering") {
    assert(runNfc("caf" + eAcuteD) === "caf" + eAcuteC)
    assert(runNfc("caf" + eAcuteC) === "caf" + eAcuteC) // composed stays
    assert(runNfc(aRingD) === aRingC)
    assert(runNfc(angstrom) === aRingC) // singleton rewrite U+212B -> U+00C5
    assert(runNfc(hangulD) === hangulC)
    assert(runNfc(marksOrdered) === marksNfc)
    assert(runNfc(marksReversed) === marksNfc) // reorder, then compose
  }

  test("NFC matches java.text.Normalizer on every vector (independent path)") {
    val vectors = Seq("caf" + eAcuteD, aRingD, angstrom, hangulD,
      marksOrdered, marksReversed, aRingD + "pple",
      "mixed ascii " + eAcuteC + " and " + eAcuteD)
    vectors.foreach { v =>
      assert(runNfc(v) ===
        java.text.Normalizer.normalize(v, java.text.Normalizer.Form.NFC))
      assert(runNfkc(v) ===
        java.text.Normalizer.normalize(v, java.text.Normalizer.Form.NFKC))
    }
  }

  test("NFKC: width forms, ligatures, superscripts, plus all NFC folds") {
    assert(runNfkc("\uFF21\uFF22\uFF23") === "ABC") // FULLWIDTH A B C
    assert(runNfkc("\uFB01le") === "file")     // LIGATURE FI
    assert(runNfkc("m\u00B2") === "m2")        // SUPERSCRIPT TWO
    assert(runNfkc("\u2115") === "N")          // DOUBLE-STRUCK N
    assert(runNfkc("a\u00A0b") === "a b")      // NO-BREAK SPACE
    assert(runNfkc("caf" + eAcuteD) === "caf" + eAcuteC) // canonical too
    // NFC must NOT touch compatibility forms
    assert(runNfc("\uFF21") === "\uFF21")
    assert(runNfc("\uFB01") === "\uFB01")
  }

  test("ASCII fast path returns the input reference unchanged") {
    val s = UTF8String.fromString("plain ascii text 123 !@#")
    assert(UnicodeNorm.nfc(s) eq s)
    assert(UnicodeNorm.nfkc(s) eq s)
    val t = UTF8String.fromString(eAcuteD)
    assert(!(UnicodeNorm.nfc(t) eq t))
  }

  test("null-safe: null in, null out") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("s")
      .select(TextClean.nfc(col("s")).as("a"), TextClean.nfkc(col("s")).as("b"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("expressions survive whole-stage codegen over a real frame") {
    import spark.implicits._
    val df = Seq("caf" + eAcuteD, "plain", "\uFF21\uFB01").toDF("s")
      .select(TextClean.nfc(col("s")).as("nfc"),
        TextClean.nfkc(col("s")).as("nfkc"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("caf" + eAcuteC, "caf" + eAcuteC),
      ("plain", "plain"), ("\uFF21\uFB01", "Afi")))
  }

  test("PREMISE PIN: the fixture corpus is pure ASCII at sf0.001 and sf0.01" +
    " (so NFKC-first trainer wiring is gate-identical to raw)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      val offending = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("text").rlike("[^\\x00-\\x7F]"))
        .count()
      assert(offending === 0L,
        s"$sf/documents has $offending non-ASCII docs -- the trainer " +
          "oracles must gain NFKC replays before this corpus trains")
    }
  }
}
