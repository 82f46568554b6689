package graft

import graft.text.DupSpans
import org.scalatest.funsuite.AnyFunSuite

/** ExactSubstr duplicate spans (text/DupSpans): maximal-run merging,
  * cross-doc and within-doc duplication, island separation, and the
  * no-blowup plan shape (semi-join, not an inner join, on window keys).
  */
class DupSpansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(c: org.apache.spark.sql.DataFrame, k: Int) = {
    import spark.implicits._
    DupSpans.spans(c, "doc_id", "text", k)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
  }

  test("two docs sharing a 6-token run: one maximal span each, k=4") {
    val got = run(corpus(
      (1L, "p q r a b c d e f x y"),   // shared run at tokens 4..9
      (2L, "a b c d e f z w")),        // shared run at tokens 1..6
      k = 4)
    // doc 1: dup windows at pos 4,5,6 -> span [4, 9], len 6
    // doc 2: dup windows at pos 1,2,3 -> span [1, 6], len 6
    assert(got == Seq((1L, 4L, 9L, 6L), (2L, 1L, 6L, 6L)))
  }

  test("within-doc repetition is duplication (corpus-concatenation view)") {
    val got = run(corpus((1L, "a b c d x y z a b c d")), k = 4)
    // "a b c d" at pos 1 and pos 8 -> two islands, spans [1,4] and [8,11]
    assert(got == Seq((1L, 1L, 4L, 4L), (1L, 8L, 11L, 4L)))
  }

  test("no duplication: empty result") {
    assert(run(corpus((1L, "a b c d e"), (2L, "f g h i j")), k = 4).isEmpty)
  }

  test("disjoint shared runs stay separate islands") {
    val got = run(corpus(
      (1L, "a b c d SEP1 SEP2 SEP3 w x y z"),
      (2L, "a b c d OTHER1 OTHER2 OTHER3 w x y z")), k = 4)
    // each doc: dup windows pos 1 and pos 8 -> spans [1,4] and [8,11]
    assert(got == Seq(
      (1L, 1L, 4L, 4L), (1L, 8L, 11L, 4L),
      (2L, 1L, 4L, 4L), (2L, 8L, 11L, 4L)))
  }

  test("overlapping dup windows merge to the maximal span, not per-window rows") {
    // a shared 6-token run with k=5 yields dup windows at pos 1 AND 2 in
    // both docs; consecutive positions merge to ONE maximal span [1,6]
    val got = run(corpus(
      (1L, "a b c d e f"),
      (2L, "a b c d e f x")), k = 5)
    assert(got == Seq((1L, 1L, 6L, 6L), (2L, 1L, 6L, 6L)))
  }

  test("removeSpans keeps exactly the first occurrence, cuts the rest") {
    val c = corpus(
      (1L, "a b c d e f x y"),     // first occurrence of the run (doc 1, pos 1)
      (2L, "p q a b c d e f"),     // later occurrence -> cut
      (3L, "u v w z1 z2 z3 z4 z5"))// no duplication -> untouched
    val got = DupSpans.removeSpans(c, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((8L, 0L, "a b c d e f x y")))
    assert(got(2L) == ((8L, 6L, "p q")))
    assert(got(3L) == ((8L, 0L, "u v w z1 z2 z3 z4 z5")))
  }

  test("removeSpans cuts the second within-doc occurrence only") {
    val c = corpus((1L, "a b c d x x a b c d"))
    val got = DupSpans.removeSpans(c, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).head
    assert(got == ((10L, 4L, "a b c d x x")))
  }

  test("removeSpans: total tokens removed + kept == original everywhere") {
    val c = corpus(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "m n o p a b c d"), (4L, "q r s t"))
    DupSpans.removeSpans(c, "doc_id", "text", k = 4).collect().foreach { r =>
      val kept = if (r.getString(3).isEmpty) 0 else r.getString(3).split(" ").length
      assert(r.getLong(1) - r.getLong(2) == kept.toLong)
    }
  }

  test("plan: dup-key reacquisition is a semi join (no multiplicity blowup)") {
    val plan = DupSpans.spans(corpus((1L, "a b c d"), (2L, "a b c d")),
      "doc_id", "text", 4).queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected left semi join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian allowed:\n$plan")
  }
}
