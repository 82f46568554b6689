package graft

import java.math.BigInteger
import java.security.MessageDigest

import graft.sample.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling (sample/Dsir): the whole integer chain
  * (hashed bigram counts, add-one-smoothed fit, ratio weights, priority
  * sample) against a single-threaded reference, the target-like-beats-
  * source-like ordering the weights exist for, partition invariance, and
  * the sample-is-a-weighted-top-k law.
  */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val B = 64

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- single-threaded reference of the exact integer chain ----

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
  private def h60(s: String): Long =
    new BigInteger(md5hex(s).substring(0, 15), 16).longValueExact()
  private def bigrams(t: String): Seq[String] = {
    val n = t.toLowerCase.replaceAll("[^a-z]+", " ").trim
    val w = if (n.isEmpty) Seq.empty else n.split(" ").toSeq
    if (w.size < 2) Seq.empty else w.sliding(2).map(_.mkString(" ")).toSeq
  }
  private def counts(rows: Seq[(Long, String)]): Map[Long, Map[Long, Long]] =
    rows.map { case (id, t) =>
      id -> bigrams(t).map(g => h60("0:" + g) % B)
        .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    }.filter(_._2.nonEmpty).toMap

  private def refFit(src: Seq[(Long, String)], tgt: Seq[(Long, String)])
  : Map[Long, (Long, Long, Long, Long)] = {
    def tot(cs: Map[Long, Map[Long, Long]]) =
      cs.values.flatMap(_.toSeq).groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val s = tot(counts(src)); val t = tot(counts(tgt))
    val sTot = s.values.sum; val tTot = t.values.sum
    (s.keySet ++ t.keySet).map { b =>
      val sc = s.getOrElse(b, 0L)
      val tc = t.getOrElse(b, 0L)
      b -> (sc, tc,
        (1000000L * (sc + 1)) / (sTot + B),
        (1000000L * (tc + 1)) / (tTot + B))
    }.toMap
  }

  private def refWeights(src: Seq[(Long, String)], tgt: Seq[(Long, String)])
  : Map[Long, (Long, Long)] = {
    val fit = refFit(src, tgt)
    counts(src).map { case (id, cs) =>
      val n = cs.values.sum
      val num = cs.map { case (b, c) => c * fit(b)._4 }.sum
      val den = cs.map { case (b, c) => c * fit(b)._3 }.sum
      id -> (n, (1000000L * num) / math.max(den, 1L))
    }
  }

  private val corpus: Seq[(Long, String)] = {
    val targetLike = (1L to 8L).map(i =>
      i -> s"the quick brown fox jumps over the lazy dog near the river bank $i")
    val sourceLike = (20L to 31L).map(i =>
      i -> s"click here buy now free offer limited deal winner prize claim today $i")
    // mixed = a verbatim half-target + half-source splice: all bigrams
    // except the one boundary pair are corpus-frequent, so its weight has
    // to land strictly between the two groups (a doc of NOVEL bigrams
    // would not: with a target corpus much smaller than the source, the
    // add-one smoothing mass itself is target-tilted — the known small-
    // target-LM artifact of the ratio estimator)
    val mixed = Seq(40L -> "the quick brown fox jumps click here buy now free offer",
      41L -> "x", 42L -> "")
    targetLike ++ sourceLike ++ mixed
  }
  private val target = corpus.filter(_._1 <= 8L)

  test("fit and weights match the single-threaded integer reference exactly") {
    val d = df(corpus: _*)
    val t = df(target: _*)
    val gotFit = Dsir.fitDists(d, t, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val wantFit = refFit(corpus, target).map { case (b, (sc, tc, q, p)) => b -> ((sc, tc, q, p)) }
    assert(gotFit == wantFit)
    val fit = Dsir.fitDists(d, t, "doc_id", "text", B)
    val got = Dsir.importanceWeights(d, fit, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == refWeights(corpus, target))
  }

  test("short/empty docs drop; every scored doc has n_ngrams >= 1") {
    val d = df(corpus: _*)
    val fit = Dsir.fitDists(d, df(target: _*), "doc_id", "text", B)
    val ids = Dsir.importanceWeights(d, fit, "doc_id", "text", B)
      .select("id", "n_ngrams").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!ids.contains(41L) && !ids.contains(42L))
    assert(ids.values.forall(_ >= 1L))
  }

  test("target-like docs outweigh source-like docs; mixed lands between") {
    val d = df(corpus: _*)
    val fit = Dsir.fitDists(d, df(target: _*), "doc_id", "text", B)
    val w = Dsir.importanceWeights(d, fit, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val tgtMin = (1L to 8L).map(w).min
    val srcMax = (20L to 31L).map(w).max
    assert(tgtMin > srcMax,
      s"target-like min $tgtMin should exceed source-like max $srcMax")
    assert(w(40L) > srcMax && w(40L) < tgtMin)
  }

  test("weights are partition invariant") {
    val d1 = df(corpus: _*).repartition(1)
    val d7 = df(corpus: _*).repartition(7)
    val f1 = Dsir.fitDists(d1, d1.filter(col("doc_id") <= 8), "doc_id", "text", B)
    val f7 = Dsir.fitDists(d7, d7.filter(col("doc_id") <= 8), "doc_id", "text", B)
    val w1 = Dsir.importanceWeights(d1, f1, "doc_id", "text", B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val w7 = Dsir.importanceWeights(d7, f7, "doc_id", "text", B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(w1 == w7)
  }

  test("cross-corpus apply: fit-missing buckets contribute zero to both sums") {
    val d = df(corpus: _*)
    val fit = Dsir.fitDists(d, df(target: _*), "doc_id", "text", B)
    // a new-batch doc with mostly-novel bigrams (buckets absent from the
    // fit contribute 0/0 via the left join; colliding ones pick up the
    // fit cell — the reference mirrors exactly that), plus an
    // in-distribution doc that must score exactly what the same text
    // scored inside the fit corpus (doc 1 minus its numbered tail)
    val batch = Seq(90L -> "zyxw vutsr qponm lkjih gfedc baazz yywwv",
      91L -> "the quick brown fox jumps over the lazy dog near the river bank")
    val fitMap = refFit(corpus, target)
    val want = counts(batch).map { case (id, cs) =>
      val num = cs.map { case (b, c) => c * fitMap.get(b).map(_._4).getOrElse(0L) }.sum
      val den = cs.map { case (b, c) => c * fitMap.get(b).map(_._3).getOrElse(0L) }.sum
      id -> ((cs.values.sum, (1000000L * num) / math.max(den, 1L)))
    }
    val got = Dsir.importanceWeights(df(batch: _*), fit, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(got(91L)._2 == refWeights(corpus, target)(1L)._2)
  }

  test("external target: source-unseen target buckets keep their rows and their t_tot mass") {
    // the paper's actual setup (external target corpus, e.g. Wikipedia
    // target vs crawl source): bigrams the source never produced must
    // still count toward t_tot and appear as (src_cnt = 0) rows, or
    // p_ppm silently misnormalizes (round-4 ADVICE item 2)
    val src = Seq(1L -> "click here buy now", 2L -> "free offer limited deal")
    val ext = Seq(50L -> "the quick brown fox", 51L -> "click here buy now")
    val gotFit = Dsir.fitDists(df(src: _*), df(ext: _*), "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val wantFit = refFit(src, ext).map { case (b, (sc, tc, q, p)) => b -> ((sc, tc, q, p)) }
    assert(gotFit == wantFit)
    assert(gotFit.exists { case (_, (sc, tc, _, _)) => sc == 0L && tc > 0L },
      "the external-target-only buckets must materialize as src_cnt = 0 rows")
    // t_tot covers ALL target occurrences: back it out of any row's p_ppm
    val tTot = counts(ext).values.flatMap(_.values).sum
    val (_, (_, tc0, _, p0)) = gotFit.find(_._2._2 > 0L).get
    assert(p0 == (1000000L * (tc0 + 1)) / (tTot + B))
  }

  test("priority sample is the deterministic w/u top-k; subset-stable in k") {
    val d = df(corpus: _*)
    val fit = Dsir.fitDists(d, df(target: _*), "doc_id", "text", B)
    val w = Dsir.importanceWeights(d, fit, "doc_id", "text", B)
      .select(col("id").as("doc_id"), col("w_ppm"))
    // reference: priority = (w * 1e6) div (1 + h60("u:"||id) % 1e6)
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refPri = wm.map { case (id, wp) =>
      id -> (wp * 1000000L) / (1L + h60("u:" + id) % 1000000L)
    }
    val want5 = refPri.toSeq.sortBy { case (id, p) => (-p, id) }.take(5).map(_._1)
    val got5 = Dsir.prioritySample(w, "doc_id", 5).collect().map(_.getLong(0)).toSeq
    assert(got5 == want5)
    val got3 = Dsir.prioritySample(w, "doc_id", 3).collect().map(_.getLong(0)).toSeq
    assert(got3 == want5.take(3), "k=3 sample must be a prefix of the k=5 sample")
  }
}
