package graft

import graft.text.Vocab
import org.scalatest.funsuite.AnyFunSuite

/** Vocabulary fitting + OOV scoring (text/Vocab): count/tie ordering,
  * rank assignment, OOV arithmetic, zero-shuffle plan for scoring.
  */
class VocabSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("topK orders by count desc then token asc; ranks 1-based") {
    import spark.implicits._
    val df = Seq((1L, "b a a c b a"), (2L, "c b d")).toDF("doc_id", "text")
    val got = Vocab.topK(df, "text", 3)
      .as[(String, Long, Long)].collect().toSeq
    // counts: a=3, b=3, c=2, d=1; tie a/b broken by token asc
    assert(got == Seq(("a", 3L, 1L), ("b", 3L, 2L), ("c", 2L, 3L)))
  }

  test("oovStats counts tokens outside the vocab; exact rate") {
    import spark.implicits._
    val df = Seq((1L, "a b x y"), (2L, "a a a"), (3L, "z")).toDF("doc_id", "text")
    val got = Vocab.oovStats(df, "doc_id", "text", Set("a", "b"))
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 2L, 0.5), (2L, 3L, 0L, 0.0), (3L, 1L, 1L, 1.0)))
  }

  test("oovStats tokenizer matches the shared column tokenizer (case, trim)") {
    import spark.implicits._
    val df = Seq((1L, "  A b  C ")).toDF("doc_id", "text")
    val got = Vocab.oovStats(df, "doc_id", "text", Set("a", "c"))
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == ((1L, 3L, 1L, 1.0 / 3.0)))
  }

  test("plan: oov scoring has no Exchange (broadcast set, map only)") {
    import spark.implicits._
    val plan = Vocab.oovStats(Seq((1L, "a")).toDF("doc_id", "text"),
      "doc_id", "text", Set("a")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"oov scoring must not shuffle:\n$plan")
  }

  test("fitted vocab feeds oov scoring end-to-end") {
    import spark.implicits._
    val corpus = Seq((1L, "aa bb cc aa"), (2L, "aa zz")).toDF("doc_id", "text")
    val vocab = Vocab.topK(corpus, "text", 2)
      .select("token").as[String].collect().toSet
    assert(vocab == Set("aa", "bb")) // counts aa=3 then tie bb<cc<zz
    val oov = Vocab.oovStats(corpus, "doc_id", "text", vocab)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(oov == Seq((1L, 4L, 1L, 0.25), (2L, 2L, 1L, 0.5)))
  }
}
