package graft.text

import java.nio.charset.Charset

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake (encoding-corruption) repair — the crawl-cleaning step
  * between HTML extraction and quality filtering (ftfy's core case):
  * a page authored in UTF-8 was decoded as Windows-1252 somewhere in
  * the serving path, so every non-ASCII character arrives as 2-3
  * latin junk characters ("café" → "cafÃ©", "—" → "â€”"). C4-class
  * pipelines repair these before language ID and dedup, because the
  * corrupted form breaks both (it sits beside q98's NFC
  * normalization in the text-hygiene family).
  *
  * The repair table is DERIVED, not hand-typed: for every character
  * in the covered repertoire (Latin-1 printables, the common General
  * Punctuation set, the euro sign) the mojibake form is computed as
  * `new String(c.utf8Bytes, windows-1252)` at object-init time, and
  * both the Spark `replace` chain and the DuckDB oracle SQL are
  * folded from the SAME table — so the two engines cannot drift and
  * a table typo is impossible by construction. Characters whose
  * UTF-8 bytes hit one of cp1252's five undefined code points
  * (0x81 0x8D 0x8F 0x90 0x9D) are excluded: their corruption is not
  * reversible through this channel.
  *
  * The whole repair is a chain of literal `replace` calls — one
  * codegen'd scan-level projection, zero exchanges, linear in bytes,
  * the same shape as `HtmlExtract`. Longest-mojibake-first ordering
  * makes the chain confluent for well-formed corruption: every
  * 3-byte sequence ("â€”") is consumed before any 2-byte key could
  * bite into it. Like every mojibake repairer (ftfy included) this
  * is a heuristic: text that LEGITIMATELY contains a full mojibake
  * key sequence (e.g. literal "Ã©" in a page ABOUT encoding bugs) is
  * "repaired" too — acceptable at corpus scale, documented here.
  */
object Mojibake {

  private val Cp1252 = Charset.forName("windows-1252")
  private val Utf8 = Charset.forName("UTF-8")

  /** cp1252's unmapped code points — UTF-8 byte patterns touching
    * these did not survive the corrupting decode losslessly.
    */
  private val Undefined: Set[Int] = Set(0x81, 0x8d, 0x8f, 0x90, 0x9d)

  /** Covered repertoire: Latin-1 Supplement printables (accented
    * Latin letters plus ¡¿«»°±·×÷ …), the common General Punctuation
    * characters (curly quotes, dashes, ellipsis, bullet, per-mille,
    * single guillemets, daggers), and the euro sign.
    */
  private val Repertoire: Seq[Char] =
    (0xa1.toChar to 0xff.toChar) ++
      Seq('–', '—', '‘', '’', '‚', '“',
        '”', '„', '†', '‡', '•', '…',
        '‰', '‹', '›', '€')

  /** (mojibakeForm, repairedChar), longest mojibake first, then
    * lexicographic — a total deterministic order shared by the Spark
    * chain and the generated oracle.
    */
  val Table: Seq[(String, String)] = Repertoire.flatMap { c =>
    val bytes = c.toString.getBytes(Utf8)
    if (bytes.exists(b => Undefined.contains(b & 0xff))) None
    else Some((new String(bytes, Cp1252), c.toString))
  }.sortBy { case (m, _) => (-m.length, m) }

  /** Repaired text: every UTF-8-seen-as-cp1252 sequence in the
    * covered repertoire restored to its intended character.
    */
  def repair(text: Column): Column =
    Table.foldLeft(text) { case (c, (moji, fixed)) =>
      replace(c, lit(moji), lit(fixed))
    }

  /** Rows needing repair — the cheap pre-filter for a selective
    * UPDATE at scale: the two lead bytes every covered corruption
    * starts with (Â Ã from Latin-1, â from the punctuation plane)
    * are necessary markers, so a corpus pass can skip the clean
    * majority without running the full chain.
    */
  def looksCorrupted(text: Column): Column =
    (instr(text, "Â") > 0) || (instr(text, "Ã") > 0) ||
      (instr(text, "â") > 0)

  /** Fixture/test helper: the EXACT corruption this module repairs —
    * the string's UTF-8 bytes re-decoded as cp1252 (driver-side
    * String→String, for building deterministic corrupted literals;
    * not a Column op and not part of the cleaning API).
    */
  def mojibake(s: String): String = new String(s.getBytes(Utf8), Cp1252)

  private def sq(s: String) = "'" + s.replace("'", "''") + "'"

  /** The SAME repair chain emitted as DuckDB SQL — generated from
    * the same table in the same order, so the oracle cannot drift.
    */
  def repairSql(expr: String): String =
    Table.foldLeft(expr) { case (c, (moji, fixed)) =>
      s"replace($c, ${sq(moji)}, ${sq(fixed)})"
    }
}
