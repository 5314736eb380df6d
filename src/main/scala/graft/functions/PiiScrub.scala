package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the privacy-scrub pass a training
  * corpus runs before anything else sees the text. No reference
  * implementation; driver-mandated pipeline operator.
  *
  * Pure per-row regexp expressions (codegen'd `RLike`/`RegExpReplace`
  * machinery): detection and redaction of a 100 TB corpus is a
  * MAP-ONLY job — no shuffle, no UDF, filters and projections push
  * down around it. The patterns are the deliberately conservative
  * common core (email, NANP-style phone fragment, IPv4) written in
  * the regex dialect subset shared by Java's engine and RE2, so a SQL
  * oracle replays byte-identically.
  */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def countOf(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  def emailCount(c: Column): Column = countOf(c, EmailRe)
  def phoneCount(c: Column): Column = countOf(c, PhoneRe)
  def ipv4Count(c: Column): Column = countOf(c, Ipv4Re)

  /** All three pattern families replaced by typed placeholders.
    * Order matters and is fixed: emails first (an email may embed
    * digit runs the narrower patterns would bite into), then IPv4
    * (dotted digits), then phone — the oracle applies the same
    * sequence. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
