package graft

import graft.text.Familiarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Char-trigram familiarity (text/Familiarity): hand-computed df and
  * score on a tiny corpus, the fluent-beats-gibberish ordering property,
  * the bounded-alphabet guarantee, and short-doc drop semantics.
  */
class FamiliaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Single-threaded reference of the whole chain. */
  private def ref(rows: Seq[(Long, String)]): (Map[String, Long], Map[Long, (Long, Long, Long)]) = {
    def norm(s: String) = s.toLowerCase.replaceAll("[^a-z]+", " ").trim
    def tgs(s: String) = { val n = norm(s); if (n.length < 3) Seq.empty
      else (0 to n.length - 3).map(i => n.substring(i, i + 3)) }
    val model = rows.flatMap { case (id, t) => tgs(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.size.toLong }
    val total = rows.size.toLong
    val scores = rows.flatMap { case (id, t) =>
      val occ = tgs(t)
      if (occ.isEmpty) None else {
        val sumDf = occ.map(model).sum
        Some(id -> ((occ.size.toLong, sumDf, (1000000L * sumDf) / (occ.size * total))))
      }
    }.toMap
    (model, scores)
  }

  test("df and score match the single-threaded reference exactly") {
    val rows = Seq(
      1L -> "The cat sat on the mat.",
      2L -> "The cat ate the rat!",
      3L -> "A dog sat on a log.",
      4L -> "zzq xqj vvk")
    val (wantModel, wantScores) = ref(rows)
    val d = df(rows: _*)
    val gotModel = Familiarity.trigramDf(d, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotModel == wantModel)
    val model = Familiarity.trigramDf(d, "doc_id", "text")
    val got = Familiarity.score(d, model, 4L, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == wantScores)
  }

  test("fluent text outscores gibberish under a shared model") {
    val fluent = (1L to 20L).map(i => i -> s"the rain in spain stays mainly in the plain number $i")
    val junk = (100L to 104L).map(i => i -> "qzx jvq wkz pqv zzj xqq kvz")
    val d = df((fluent ++ junk): _*)
    val model = Familiarity.trigramDf(d, "doc_id", "text")
    val scores = Familiarity.score(d, model, 25L, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val worstFluent = fluent.map(f => scores(f._1)).min
    val bestJunk = junk.map(j => scores(j._1)).max
    assert(worstFluent > bestJunk,
      s"fluent min $worstFluent not above junk max $bestJunk")
  }

  test("model is bounded by the 27-symbol alphabet") {
    val d = df((1L to 50L).map(i => i -> s"Mixed CASE text #$i with 123 numbers & sym~bols ünïcödé"): _*)
    val rows = Familiarity.trigramDf(d, "doc_id", "text").collect()
    assert(rows.length <= 27 * 27 * 27)
    // every trigram drawn from [a-z ] only
    assert(rows.forall(_.getString(0).forall(c => c == ' ' || (c >= 'a' && c <= 'z'))))
  }

  test("docs with no trigram after normalization are dropped") {
    val d = df(1L -> "ab", 2L -> "1234 !!", 3L -> "abc")
    val model = Familiarity.trigramDf(d, "doc_id", "text")
    val ids = Familiarity.score(d, model, 3L, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L))
  }
}
