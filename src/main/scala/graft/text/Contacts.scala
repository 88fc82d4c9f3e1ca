package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Contact-identifier canonicalization — the normalization pass that
  * runs BEFORE record linkage (q104) and identity joins: the same
  * person arrives as "John.Doe+promo@GMAIL.com" and
  * "johndoe@googlemail.com", or "+1 (202) 555-0147" and
  * "202.555.0147", and raw equality treats them as four people.
  *
  * Email rules (the deliverability-equivalence set):
  *  - trim + lowercase;
  *  - plus-tag stripped from the local part (RFC-legal subaddressing);
  *  - googlemail.com ≡ gmail.com;
  *  - dots in the local part dropped for the gmail family ONLY
  *    (dot-insensitivity is a Gmail behavior, NOT an RFC rule —
  *    applying it to arbitrary domains would merge distinct users);
  *  - anything without exactly one '@' canonicalizes to null.
  *
  * Phone rules (NANP normalization): strip every non-digit; drop a
  * leading country '1' from 11-digit numbers; exactly 10 digits
  * remain or the value is null (unparseable ≠ empty string — callers
  * count nulls as invalid).
  *
  * All rules are built from codegen'd string expressions with
  * RE2-portable patterns (HtmlExtract's discipline), so the DuckDB
  * twin runs the same regex text verbatim. Zero exchanges — pure
  * scan projections.
  */
object Contacts {

  def canonicalEmail(c: Column): Column = {
    val t = lower(trim(c))
    val local0 = regexp_extract(t, "^([^@]+)@([^@]+)$", 1)
    val domain0 = regexp_extract(t, "^([^@]+)@([^@]+)$", 2)
    val domain = when(domain0 === "googlemail.com", lit("gmail.com"))
      .otherwise(domain0)
    val noTag = regexp_replace(local0, "\\+.*$", "")
    val local = when(domain === "gmail.com",
      regexp_replace(noTag, "\\.", "")).otherwise(noTag)
    when(local0 =!= "" && domain0 =!= "" && local =!= "",
      concat(local, lit("@"), domain))
  }

  def canonicalPhone(c: Column): Column = {
    val digits = regexp_replace(c, "[^0-9]", "")
    val national = when(length(digits) === 11 &&
      substring(digits, 1, 1) === "1", substring(digits, 2, 10))
      .otherwise(digits)
    when(length(national) === 10, national)
  }
}
