package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text repair/normalization — the "fix the bytes before judging the
  * words" pass (ftfy/clean-text lineage) that runs between extraction
  * (q217) and every quality gate: real corpora arrive with cp1252
  * mojibake (UTF-8 read as Windows-1252 — `cafÃ©`), zero-width and
  * control characters that poison tokenizers, and whitespace runs that
  * distort length-based gates. All three repairs are codegen'd string
  * expressions — one narrow map, the q217 posture.
  *
  * Order matters and is pinned by spec: mojibake FIRST (its byte pairs
  * contain no control chars, but repairing after a whitespace collapse
  * could merge across a boundary), then control/zero-width strip, then
  * whitespace collapse + trim.
  *
  * The mojibake table is the verified cp1252 round-trip of the seven
  * most common victims (é ï è ü ’ – “) — a deliberate allowlist, not a
  * decoder: full ftfy-style repair needs confidence scoring over
  * encoding hypotheses, out of scope and documented. No table entry is
  * a prefix of another, so the replace chain is order-free within
  * itself. */
object TextClean {

  /** (mojibake, repaired) — each left side is exactly
    * `right.getBytes(UTF_8).decode(cp1252)`, machine-verified. */
  val MojibakeTable: Seq[(String, String)] = Seq(
    "Ã©" -> "é", "Ã¯" -> "ï", "Ã¨" -> "è", "Ã¼" -> "ü",
    "â€™" -> "’", "â€“" -> "–", "â€œ" -> "“")

  def clean(c: Column): Column = {
    val repaired = MojibakeTable.foldLeft(c) { case (x, (m, r)) =>
      replace(x, lit(m), lit(r))
    }
    val stripped = regexp_replace(repaired,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\u200B\\uFEFF]", "")
    trim(regexp_replace(stripped, "[ \\t\\r\\n]+", " "))
  }

  private def viaFn(name: String, arg: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.register)
    call_function(name, arg)
  }

  /** Unicode NFC (canonical composition, UAX #15) — what dedup/storage
    * wants: byte-equal iff canonically equal. Native codegen'd
    * expression ([[graft.functions.NfcNormalize]]) with an ASCII
    * fast path; hash-gated cross-engine vs DuckDB `nfc_normalize`
    * (q246). */
  def nfc(c: Column): Column = viaFn("graft_nfc", c)

  /** Unicode NFKC (compatibility composition) — what TOKENIZERS want
    * (SentencePiece's default first step): fullwidth→ASCII, ligatures
    * split, superscripts folded. Wired as the first step of the trainer
    * families' tokenization ([[TextQueries]] q75/q238, [[UnigramLm]]
    * q232/q233/q236); identity on the pure-ASCII fixture corpus, so the
    * relational training-replay oracles stay exact (premise pinned by
    * UnicodeNormSpec). No DuckDB twin exists for NFKC — conformance
    * vectors (width/compat forms, ligatures, combining reorder, Hangul)
    * live in the same spec. */
  def nfkc(c: Column): Column = viaFn("graft_nfkc", c)
}
