package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer-training (text/Bpe): the greedy fit on a hand-traced
  * corpus, the non-overlapping merge scan, segmentation invariants, the
  * distributed/local pair-count agreement, and fit determinism under
  * partitioning.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("fitMerges replays the hand-traced greedy fit exactly") {
    // types: aaab x3, ab x2
    // gen0 pairs: (a,a)=6, (a,b)=5        -> merge (a,a,6)
    // gen1: [aa,a,b]x3 [a,b]x2: (aa,a)=3, (a,b)=5 -> merge (a,b,5)
    // gen2: [aa,ab]x3 [ab]x2: (aa,ab)=3   -> merge (aa,ab,3)
    // gen3: no pair left with count >= 2  -> stop early (12 requested)
    val got = Bpe.fitMerges(Seq(("aaab", 3L), ("ab", 2L)), numMerges = 12)
    assert(got == Seq((1, "a", "a", 6L), (2, "a", "b", 5L), (3, "aa", "ab", 3L)))
  }

  test("applyMerge is greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("x", "a", "b", "a", "b"), "a", "b").toSeq == Seq("x", "ab", "ab"))
    assert(Bpe.applyMerge(Array("q"), "a", "b").toSeq == Seq("q"))
  }

  test("segment concatenates back to the word and never grows token count") {
    val merges = Bpe.fitMerges(Seq(("lower", 4L), ("lowest", 3L), ("low", 7L)), 8)
      .map { case (_, l, r, _) => (l, r) }
    for (w <- Seq("low", "lower", "lowest", "slowest", "wildly", "l")) {
      val segs = Bpe.segment(w, merges)
      assert(segs.mkString == w, s"concat invariant broken for $w")
      assert(segs.length <= w.length)
    }
    // learned merges actually compress in-domain words
    assert(Bpe.segment("lowest", merges).length < "lowest".length)
  }

  test("tie-break is (cnt desc, left asc, right asc)") {
    // (a,b) and (b,a) both have count 2; (a,b) must win on pair order
    val got = Bpe.fitMerges(Seq(("ab", 1L), ("ab", 1L), ("ba", 2L)), 1)
    assert(got.head._2 == "a" && got.head._3 == "b")
  }

  test("pairStats (distributed) matches local generation-0 counting") {
    import spark.implicits._
    val types = Seq(("aaab", 3L), ("ab", 2L), ("z", 9L)).toDF("word", "cnt")
    val got = Bpe.pairStats(types)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "a", 6L), ("a", "b", 5L)))
  }

  test("adversarial corpus: empty/whitespace docs and control-char tokens (oracle-cross-checked)") {
    import spark.implicits._
    // the exact corpus hand-run through the DuckDB oracle replay (newline
    // accumulator separator, tok <> '' filter, len<2 identity guard):
    // empty/whitespace docs must vanish, a token containing U+001F must
    // segment by its actual characters
    val docsDf = Seq((1L, "aa ab aa ab aaab"), (2L, ""), (3L, "   "),
      (4L, "ab\u001Fcd ab\u001Fcd x")).toDF("doc_id", "text")
    val wt = Bpe.wordTypes(docsDf, "text")
    assert(wt.filter(length(col("word")) === 0).count() == 0, "empty token leaked into word types")
    val got = Bpe.fitMergesDf(spark, wt, numMerges = 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    // DuckDB replay of the same corpus produced exactly these merges
    assert(got == Seq((1, "a", "b", 5L), (2, "a", "a", 3L),
      (3, "\u001F", "c", 2L), (4, "\u001Fc", "d", 2L)), s"fit diverged: $got")
    val segs = Bpe.segment("ab\u001Fcd", got.map(m => (m._2, m._3)))
    assert(segs.toSeq == Seq("ab", "\u001Fcd"), s"segmentation diverged: ${segs.toSeq}")
  }

  test("fitMergesDf is partition-invariant and matches the local fit") {
    import spark.implicits._
    val docsDf = Seq((1L, "the cat sat"), (2L, "the cat"), (3L, "that hat"))
      .toDF("doc_id", "text")
    val wt = Bpe.wordTypes(docsDf, "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Bpe.fitMergesDf(spark, df, numMerges = 6)
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val a = run(wt)
    assert(a == run(wt.repartition(16)), "partition-variant fit")
    val local = Bpe.fitMerges(
      wt.as[(String, Long)].collect().toSeq, numMerges = 6)
    assert(a == local)
    assert(a.nonEmpty && a.map(_._1) == (1 to a.length))
  }
}
