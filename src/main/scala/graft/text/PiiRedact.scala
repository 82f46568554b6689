package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction for web-corpus curation (the CCNet/RefinedWeb/
  * FineWeb pipeline stage; e.g. Penedo et al. 2024 arXiv:2406.17557 §3.4
  * redacts emails and IPs before release). The reference has no PII stage —
  * this is a training-pipeline operator the graft adds beyond its surface.
  *
  * Pure per-row regexp column expressions (codegen'd, zero shuffle — the
  * 100 TB shape is a single map-side scan). Patterns are restricted to the
  * dialect intersection of java.util.regex (Spark) and RE2 (DuckDB oracle):
  * no backreferences, no lookaround — so the oracle recomputes the chain
  * verbatim.
  *
  * Counting is SEQUENTIAL on progressively redacted text (emails first,
  * then SSN-shaped ids, then IPv4) so one span is never double-counted
  * across categories: an email with an SSN-shaped local part
  * (123-45-6789@x.co) counts as one email and zero ids.
  */
object PiiRedact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  val EmailTag = "<EMAIL>"
  val SsnTag = "<ID>"
  val Ipv4Tag = "<IP>"

  /** Adds n_emails / n_ids / n_ips (Long) and text_redacted to `df`. */
  def redact(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, EmailTag)
    val t2 = regexp_replace(t1, SsnRe, SsnTag)
    val t3 = regexp_replace(t2, Ipv4Re, Ipv4Tag)
    df.withColumn("n_emails", regexp_count(t0, lit(EmailRe)).cast("long"))
      .withColumn("n_ids", regexp_count(t1, lit(SsnRe)).cast("long"))
      .withColumn("n_ips", regexp_count(t2, lit(Ipv4Re)).cast("long"))
      .withColumn("text_redacted", t3)
  }

  /** Plain-Scala mirror of the same sequential chain for spec vectors. */
  def redactString(text: String): (Long, Long, Long, String) = {
    def countOf(s: String, re: String): Long = {
      val m = java.util.regex.Pattern.compile(re).matcher(s)
      var c = 0L
      while (m.find()) c += 1
      c
    }
    val ne = countOf(text, EmailRe)
    val t1 = text.replaceAll(EmailRe, EmailTag)
    val ni = countOf(t1, SsnRe)
    val t2 = t1.replaceAll(SsnRe, SsnTag)
    val np = countOf(t2, Ipv4Re)
    (ne, ni, np, t2.replaceAll(Ipv4Re, Ipv4Tag))
  }
}
