package graft.text

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TextClean.clean]] — rule-by-rule and the ordering that q222's
  * composed fixture can't isolate. */
class TextCleanSpec extends SparkSpec {

  private def clean(ss: String*): Seq[String] = {
    import spark.implicits._
    ss.toDF("t").select(TextClean.clean(col("t")))
      .collect().map(_.getString(0)).toSeq
  }

  test("the mojibake table IS the cp1252 round-trip, machine-checked") {
    TextClean.MojibakeTable.foreach { case (moj, fixed) =>
      val rt = new String(fixed.getBytes(StandardCharsets.UTF_8), "windows-1252")
      assert(rt == moj, s"table entry $moj -> $fixed is not the cp1252 round-trip")
    }
    // and no entry is a prefix of another (replace order must not matter)
    val keys = TextClean.MojibakeTable.map(_._1)
    for (a <- keys; b <- keys if a != b)
      assert(!b.startsWith(a), s"$a prefixes $b")
  }

  test("each repair class alone") {
    assert(clean(
      "cafÃ© naÃ¯ve crÃ¨me Ã¼ber",      // mojibake
      "itâ€™s â€œquoted â€“ done",      // punctuation mojibake
      "a\u0000b\u001Fc\u200Bd\uFEFFe", // control + zero-width
      "  a \t b\r\nc   ") ==           // whitespace runs + trim
      Seq("café naïve crème über", "it’s “quoted – done", "abcde", "a b c"))
  }

  test("control strip runs BEFORE whitespace collapse (the order pin)") {
    // collapse-first would leave 'a  b' (the U+0001 blocks the run and
    // is only removed afterwards); strip-first yields one space
    assert(clean("a \u0001 b") == Seq("a b"))
  }

  test("idempotent and a no-op on already-clean text") {
    val once = clean("cafÃ©  x\u200B y").head
    assert(clean(once) == Seq(once))
    assert(clean("plain single spaced text") == Seq("plain single spaced text"))
  }
}
