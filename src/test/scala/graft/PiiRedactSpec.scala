package graft

import graft.text.PiiRedact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII redaction (text/PiiRedact): category patterns, the sequential
  * no-double-count rule, DataFrame/plain-Scala parity, zero-shuffle plan.
  */
class PiiRedactSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("emails, ssn-shaped ids, ipv4 each detected and tagged") {
    val (ne, ni, np, red) = PiiRedact.redactString(
      "mail a.b+c@ex-1.org ssn 123-45-6789 host 10.0.0.255 end")
    assert((ne, ni, np) == (1L, 1L, 1L))
    assert(red == "mail <EMAIL> ssn <ID> host <IP> end")
  }

  test("ssn-shaped local part counts as one email, never as an id") {
    // sequential rule: the email pass replaces the whole address before
    // the id pass runs, so its local part is not double-counted
    val (ne, ni, np, red) = PiiRedact.redactString("123-45-6789@x.co plus 123-45-6789")
    assert((ne, ni, np) == (1L, 1L, 0L))
    assert(red == "<EMAIL> plus <ID>")
  }

  test("word boundaries: short version strings and long digit runs not ipv4/ssn") {
    // "1234-56-7890": \b\d{3}- can only anchor at '1' (digit runs have no
    // inner boundary) where the 4th digit breaks the match; "a@b.c" has a
    // single-letter tld
    val (ne, ni, np, red) = PiiRedact.redactString("v1.2.3 and 1234-56-7890 a@b.c")
    assert((ne, ni, np) == (0L, 0L, 0L))
    assert(red == "v1.2.3 and 1234-56-7890 a@b.c")
  }

  test("multiple matches per category all counted and replaced") {
    val (ne, ni, np, red) = PiiRedact.redactString("a@b.co c@d.org 1.2.3.4 5.6.7.8")
    assert((ne, ni, np) == (2L, 0L, 2L))
    assert(red == "<EMAIL> <EMAIL> <IP> <IP>")
  }

  test("DataFrame chain matches the plain-Scala mirror on mixed rows") {
    import spark.implicits._
    val texts = Seq(
      "contact u7@example.com or 192.168.1.1",
      "clean document with no pii at all",
      "ids 000-11-2222 and 999-99-9999 mail x_y%z@sub.host.net",
      "edge a@b.c single-letter tld does not match",
      "10.0.0.1 leading and trailing 8.8.8.8")
    val df = PiiRedact.redact(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"), "text")
      .select($"doc_id", $"n_emails", $"n_ids", $"n_ips", $"text_redacted")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    texts.zipWithIndex.foreach { case (t, i) =>
      val (ne, ni, np, red) = PiiRedact.redactString(t)
      assert(df(i) == ((i.toLong, ne, ni, np, red)), s"row $i diverged")
    }
  }

  test("plan: pure map-side scan, no exchange") {
    import spark.implicits._
    val plan = PiiRedact.redact(Seq((1L, "a@b.co")).toDF("doc_id", "text"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redaction must not shuffle:\n$plan")
  }
}
