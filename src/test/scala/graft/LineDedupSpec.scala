package graft

import graft.text.LineDedup
import org.scalatest.funsuite.AnyFunSuite

/** Line-level corpus dedup (text/LineDedup): hot lines dropped at every
  * occurrence with order preserved, per-doc-distinct df (in-doc repetition
  * cannot self-promote a line to hot), the all-hot edge, and the
  * untouched-doc round trip.
  */
class LineDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)], minDf: Long): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    LineDedup.dedupLines(docs.toDF("doc_id", "text"), "doc_id", "text", minDf)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
  }

  test("hot lines dropped everywhere, order preserved, counts exact") {
    val nav = "home about contact"
    val docs = Seq(
      0L -> s"$nav\nalpha body one\nbeta body two\n$nav",
      1L -> s"$nav\ngamma body three",
      2L -> s"$nav\ndelta body four",
      3L -> "unique page\nno nav here")
    val got = run(docs, minDf = 3L)
    assert(got(0L) == (("alpha body one\nbeta body two", 4L, 2L)))
    assert(got(1L) == (("gamma body three", 2L, 1L)))
    assert(got(2L) == (("delta body four", 2L, 1L)))
    assert(got(3L) == (("unique page\nno nav here", 2L, 0L)))
  }

  test("df is per-doc distinct: in-doc repetition does not make a line hot") {
    val docs = Seq(
      0L -> "echo\necho\necho\necho\nbody a",
      1L -> "body b\nbody c")
    val got = run(docs, minDf = 2L)
    // "echo" appears 4x but in ONE doc -> df 1 -> kept
    assert(got(0L) == (("echo\necho\necho\necho\nbody a", 5L, 0L)))
    assert(got(1L) == (("body b\nbody c", 2L, 0L)))
  }

  test("a document whose every line is hot comes back empty") {
    val docs = Seq(
      0L -> "shared one\nshared two",
      1L -> "shared one\nshared two",
      2L -> "shared one\nshared two\nown line")
    val got = run(docs, minDf = 3L)
    assert(got(0L) == (("", 2L, 2L)))
    assert(got(1L) == (("", 2L, 2L)))
    assert(got(2L) == (("own line", 3L, 2L)))
  }

  test("hotLines returns exactly the lines at/above the threshold") {
    import spark.implicits._
    val docs = Seq(
      0L -> "a\nb\nc", 1L -> "a\nb", 2L -> "a").toDF("doc_id", "text")
    val hot = LineDedup.hotLines(docs, "text", minDf = 2L)
      .as[String].collect().toSet
    assert(hot == Set("a", "b"))
  }
}
