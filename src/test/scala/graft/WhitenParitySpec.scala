package graft

import graft.norm.TextNorm
import graft.sig.CheapEmbed
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** G13 whitening parity (sig/CheapEmbed.fitWhiten/applyWhiten vs
  * fixtures/whiten_golden.jsonl): the reference ships only the APPLY
  * (`_apply_whiten`, embed_model.py:550-566) and loads mean/top_pc from
  * persisted state — the fixture fits those params with the numpy mirror
  * of our deterministic fit spec and then runs the REFERENCE apply with
  * them injected as loaded state. Parity here proves (a) the fit is the
  * same function in both engines and (b) our apply matches the
  * reference's float32 whiten-and-renormalize chain on every golden
  * decision pair.
  */
class WhitenParitySpec extends AnyFunSuite {

  private lazy val fixtureLines = GoldenFixtures.lines("fixtures/whiten_golden.jsonl")
  private lazy val fitted = fixtureLines.head
  private lazy val goldenMean = fitted.get("mean").elements().asScala.map(_.asDouble()).toArray
  private lazy val goldenPc = fitted.get("top_pc").elements().asScala.map(_.asDouble()).toArray

  private lazy val normByUrl: Map[String, String] =
    GoldenFixtures.corpus.map(d => d.url -> TextNorm.normalize(d.text)).toMap

  private lazy val params: CheapEmbed.WhitenParams = {
    val vecs = normByUrl.keys.toSeq.sorted.map(u => CheapEmbed.embed(normByUrl(u)))
    CheapEmbed.fitWhiten(vecs.toIndexedSeq)
  }

  test("fitted mean and top PC match the numpy mirror") {
    assert(fitted.get("n_fit_docs").asInt() == normByUrl.size)
    assert(params.mean.length == 384 && params.topPc.length == 384)
    val meanErr = params.mean.toSeq.zip(goldenMean).map { case (a, b) => math.abs(a - b) }.max
    assert(meanErr < 1e-6, s"mean max abs err $meanErr")
    val pcErr = params.topPc.toSeq.zip(goldenPc).map { case (a, b) => math.abs(a - b) }.max
    assert(pcErr < 1e-5, s"top-PC max abs err $pcErr")
    // the PC is unit-length with the sign convention applied
    val n = math.sqrt(params.topPc.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-6)
  }

  test("whitened cosines match the reference _apply_whiten on all golden pairs") {
    val emb = normByUrl.map { case (u, t) => u -> CheapEmbed.embed(t) }
    var n = 0
    var maxErr = 0.0
    fixtureLines.drop(1).foreach { p =>
      val a = p.get("a").asText(); val b = p.get("b").asText()
      val want = p.get("cos_w").asDouble()
      val got = CheapEmbed.whitenedCosine(emb(a), emb(b), params)
      maxErr = math.max(maxErr, math.abs(got - want))
      n += 1
    }
    assert(n == 3302, s"expected 3302 golden pairs, saw $n")
    assert(maxErr < 1e-6, s"whitened cosine max abs err $maxErr over $n pairs")
  }

  test("applyWhiten output is unit-norm (zero vectors stay zero); projection removed") {
    val v = CheapEmbed.embed(normByUrl.values.head)
    val w = CheapEmbed.applyWhiten(v, params)
    val n = math.sqrt(w.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-6)
    // component along the top PC is (float32-)zero after removal + renorm
    val proj = w.toSeq.zip(params.topPc).map { case (x, p) => x.toDouble * p.toDouble }.sum
    assert(math.abs(proj) < 1e-6, s"residual top-PC projection $proj")
    val z = CheapEmbed.applyWhiten(new Array[Float](384),
      CheapEmbed.WhitenParams(new Array[Float](384), params.topPc))
    assert(z.forall(_ == 0.0f))
  }
}
