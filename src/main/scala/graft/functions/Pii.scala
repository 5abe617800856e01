package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction for training-data hygiene — pure regexp columns
  * (codegen'd, no UDFs), so the scrub runs inside the scan's projection at
  * any scale. Patterns deliberately use only the regex subset that Java's
  * engine and RE2-style engines (DuckDB's `regexp_*`) interpret identically:
  * character classes, bounded repetition, non-capturing groups — no
  * lookaround, no backreferences.
  */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re  = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Replace emails, then IPv4s, then phone numbers with typed tags. Email
    * first: an address can embed digit runs that the later patterns would
    * otherwise mangle mid-token.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe)).cast("long")
  def ipv4Count(text: Column): Column  = regexp_count(text, lit(ipv4Re)).cast("long")
  def phoneCount(text: Column): Column = regexp_count(text, lit(phoneRe)).cast("long")

  /** Any PII present — the cheap pre-filter: at scale, route only flagged
    * documents through the (3-pass) redaction projection.
    */
  def hasPii(text: Column): Column =
    regexp_like(text, lit(emailRe)) || regexp_like(text, lit(ipv4Re)) ||
      regexp_like(text, lit(phoneRe))
}
