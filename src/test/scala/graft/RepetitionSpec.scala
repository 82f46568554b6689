package graft

import graft.text.Repetition
import org.scalatest.funsuite.AnyFunSuite

/** Gopher repetition signals (text/Repetition): hand-computed vectors for
  * every fraction, tie-break of the top gram, edge docs, and DataFrame
  * parity with the per-string function.
  */
class RepetitionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("dup line fractions count all occurrences of repeated lines") {
    // lines: a(3), bb(1), ccc(2) -> 6 lines, dup = 3+2 = 5
    // chars: a*3=3, bb=2, ccc*2=6 -> tot 11, dup 3+6=9
    val (nLines, dlf, dlcf, _, _) = Repetition.signals("a\nbb\nccc\na\nccc\na")
    assert(nLines == 6L)
    assert(dlf == 5.0 / 6.0)
    assert(dlcf == 9.0 / 11.0)
  }

  test("top gram fraction: count, char length, and lexicographic tie-break") {
    // tokens: x y x y z -> 2-grams: "x y"(2), "y x"(1), "y z"(1)
    // wordChars = 5 + 4 = 9; top2 = 2 * 3 / 9
    val (_, _, _, t2, t3) = Repetition.signals("x y x y z")
    assert(t2 == 2.0 * 3.0 / 9.0)
    // 3-grams: "x y x"(1), "y x y"(1), "x y z"(1) -> tie at 1, min gram
    // is "x y x" (len 5) -> 1 * 5 / 9
    assert(t3 == 5.0 / 9.0)
  }

  test("lowercasing unifies grams; newlines are token separators") {
    val (_, _, _, t2, _) = Repetition.signals("Ab cd\nab CD")
    // tokens: ab cd ab cd -> "ab cd"(2), "cd ab"(1); wordChars = 8+3 = 11
    assert(t2 == 2.0 * 5.0 / 11.0)
  }

  test("edge docs: empty, single line, fewer tokens than n") {
    assert(Repetition.signals("") == ((1L, 0.0, 0.0, 0.0, 0.0)))
    val (n1, d1, c1, t2a, t3a) = Repetition.signals("only one line")
    assert(n1 == 1L && d1 == 0.0 && c1 == 0.0)
    assert(t2a > 0.0) // "only one"(1) * 8 / 13
    assert(t2a == 8.0 / 13.0)
    assert(t3a == 13.0 / 13.0)
    val (_, _, _, t2b, t3b) = Repetition.signals("solo")
    assert(t2b == 0.0 && t3b == 0.0)
  }

  test("gopherGate: repeated doc fails the right thresholds, clean doc passes") {
    import spark.implicits._
    val docs = Seq(
      // 6 lines, 4 of them duplicates: dup_line_frac 4/6 > 0.3 -> fail
      1L -> "home page\nreal content sentence one here\nhome page\nhome page\nother words appear now\nhome page",
      // no repetition, long enough that a count-1 top gram is a small
      // char fraction (Gopher thresholds assume non-trivial length)
      2L -> (1 to 40).map(i => s"w$i").grouped(8)
        .map(_.mkString(" ")).mkString("\n")).toDF("doc_id", "text")
    val got = Repetition.gopherGate(Repetition.signalsDf(spark, docs))
      .orderBy("doc_id").collect()
    val r1 = got(0); val r2 = got(1)
    assert(!r1.getBoolean(1) && !r1.getBoolean(5), s"repeated doc must fail: $r1")
    assert((2 to 5).forall(i => r2.getBoolean(i)), s"clean doc must pass all: $r2")
    // conjunction consistency on every row
    got.foreach(r => assert(r.getBoolean(5) ==
      (r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4))))
  }

  test("signalsDf matches the per-string function row for row") {
    import spark.implicits._
    val texts = Seq(
      1L -> "a\nbb\nccc\na\nccc\na",
      2L -> "x y x y z",
      3L -> "The quick brown fox\nthe quick brown fox\njumps",
      4L -> "solo")
    val df = Repetition.signalsDf(spark, texts.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    texts.sortBy(_._1).zip(df).foreach { case ((id, t), row) =>
      val s = Repetition.signals(t)
      assert(row.getLong(0) == id)
      assert((row.getLong(1), row.getDouble(2), row.getDouble(3),
        row.getDouble(4), row.getDouble(5)) == s)
    }
  }
}
