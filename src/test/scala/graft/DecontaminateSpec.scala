package graft

import graft.text.Decontaminate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Benchmark decontamination (text/Decontaminate): n-gram windowing edge
  * cases, distinct-hit counting, clean-doc rows, and the broadcast plan
  * shape (the corpus side must not shuffle to discover hits).
  */
class DecontaminateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("doc containing an eval n-gram is flagged; others clean") {
    import spark.implicits._
    val evalDf = Seq("c d e f").toDF("text")
    val c = corpus(
      (1L, "a b c d e f g"), // contains "c d e f"
      (2L, "a b c d x f g"), // broken window
      (3L, "c d e"))         // too short for n=4
    val got = Decontaminate
      .flag(c, Decontaminate.evalNgrams(evalDf, "text", 4), "doc_id", "text", 4)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 1L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  test("repeated contaminated window counts once (distinct n-grams)") {
    import spark.implicits._
    val evalDf = Seq("x y").toDF("text")
    val c = corpus((1L, "x y q x y q x y"), (2L, "x q y"))
    val got = Decontaminate
      .flag(c, Decontaminate.evalNgrams(evalDf, "text", 2), "doc_id", "text", 2)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // doc 1 has "x y" three times -> 1 distinct hit
    assert(got == Seq((1L, 1L, true), (2L, 0L, false)))
  }

  test("multiple distinct eval n-grams in one doc are all counted") {
    import spark.implicits._
    val evalDf = Seq("a b c", "c d e").toDF("text")
    val c = corpus((1L, "a b c d e"), (2L, "a b x d e"))
    val got = Decontaminate
      .flag(c, Decontaminate.evalNgrams(evalDf, "text", 3), "doc_id", "text", 3)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // doc 1 windows: "a b c","b c d","c d e" -> hits {a b c, c d e} = 2
    assert(got == Seq((1L, 2L, true), (2L, 0L, false)))
  }

  test("tokenizer lowercases and trims; short-doc window guard") {
    import spark.implicits._
    val ng = corpus((1L, "  A  b C "), (2L, "a"))
      .select(col("doc_id"),
        Decontaminate.ngramsCol(Decontaminate.tokensCol(col("text")), 2).as("g"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(ng == Seq((1L, Seq("a b", "b c")), (2L, Seq.empty)))
  }

  test("plan: hit discovery is a broadcast join, no corpus-side exchange before it") {
    val evalDf = {
      import spark.implicits._
      Seq("a b c d").toDF("text")
    }
    val flagged = Decontaminate.flag(
      corpus((1L, "a b c d e")), Decontaminate.evalNgrams(evalDf, "text", 4),
      "doc_id", "text", 4)
    val plan = flagged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast hash join for eval-set lookup, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not sort-merge against the eval set:\n$plan")
  }

  test("containment: fraction threshold by integer cross-multiply, edge docs defined") {
    import spark.implicits._
    val evalDf = Seq("p q r s t u").toDF("text")
    val c = corpus(
      (1L, "p q r s t u v w"),  // 5 distinct 4-grams, 3 hits -> 3*2 >= 5*1: flagged at 1/2
      (2L, "p q r s x y z w"),  // 5 distinct 4-grams, 1 hit  -> 1*2 <  5*1: clean
      (3L, "a b c"),            // shorter than n -> n_ngrams = 0, never flagged
      (4L, "p q r s p q r s p q r s")) // repeats collapse: distinct grams only
    val got = Decontaminate
      .containment(c, Decontaminate.evalNgrams(evalDf, "text", 4), "doc_id", "text", 4,
        thrNum = 1, thrDen = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // doc 4: windows = pqrs qrsp rspq spqr pqrs ... -> 4 distinct, 1 hit (pqrs)
    assert(got == Seq(
      (1L, 5L, 3L, true),
      (2L, 5L, 1L, false),
      (3L, 0L, 0L, false),
      (4L, 4L, 1L, false)))
  }

  test("containment flags are a subset of any-hit flags (same eval set)") {
    import spark.implicits._
    val evalDf = Seq("c d e f g h i j").toDF("text")
    val c = corpus((1L, "a b c d e f g h i j k"), (2L, "c d e f x g h i j y"),
      (3L, "no overlap here at all"))
    val ev = Decontaminate.evalNgrams(evalDf, "text", 4)
    val anyHit = Decontaminate.flag(c, ev, "doc_id", "text", 4)
      .filter(col("contaminated")).select("doc_id").as[Long].collect().toSet
    val frac = Decontaminate.containment(c, ev, "doc_id", "text", 4, 1, 4)
      .filter(col("flagged")).select("doc_id").as[Long].collect().toSet
    assert(frac.subsetOf(anyHit), s"containment flags $frac not within any-hit $anyHit")
  }
}
