package graft

import graft.cc.Agglomerative
import graft.norm.TextNorm
import graft.sig.CheapEmbed
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** X4 agglomerative parity (cc/Agglomerative vs fixtures/agglo_golden.jsonl):
  * the fixture is a float64 numpy mirror of the reference's sklearn path
  * (average linkage, precomputed cosine distances, 75th-percentile
  * threshold — cli.py:190-224) over the reference's own `_cheap_embed`
  * vectors of the fixture corpus. Partition equality is the assertion —
  * label NUMBERS are normalized to smallest-member order on both sides
  * (sklearn's own numbering depends on heap order).
  */
class AggloParitySpec extends AnyFunSuite {

  private lazy val lines = GoldenFixtures.lines("fixtures/agglo_golden.jsonl")
  private lazy val goldenThreshold = lines.head.get("threshold").asDouble()
  private lazy val goldenLabels =
    lines(1).get("labels").elements().asScala.map(_.asInt()).toArray

  private lazy val vecs: IndexedSeq[Array[Float]] =
    GoldenFixtures.corpus.map(d => CheapEmbed.embed(TextNorm.normalize(d.text))).toIndexedSeq

  test("auto threshold matches the numpy mirror of the reference heuristic") {
    val t = Agglomerative.thresholdFromSample(vecs)
    // 1e-8: the sub-1e-12 ulp clamp makes the d>0 filter engine-independent,
    // but the surviving distances still differ in the last ulps (BLAS matmul
    // vs sequential accumulation), so the percentile carries ~1e-9 noise.
    // The load-bearing assertion is the exact partition below.
    assert(math.abs(t - goldenThreshold) < 1e-8,
      s"threshold $t vs golden $goldenThreshold")
  }

  test("UPGMA cut reproduces the golden partition exactly") {
    val (t, labels) = Agglomerative.clusterAuto(vecs)
    assert(labels.length == goldenLabels.length)
    assert(labels.max == goldenLabels.max,
      s"cluster count ${labels.max + 1} vs golden ${goldenLabels.max + 1}")
    // both labelings are smallest-member-normalized, so equality is direct
    assert(labels.toSeq == goldenLabels.toSeq,
      s"partition mismatch at threshold $t")
  }

  test("threshold semantics: merging stops at-or-above the cutoff") {
    // a 4-point line in 2D: d(0,1) tiny, d(2,3) tiny, groups far apart
    def v(x: Float, y: Float) = Array(x, y) ++ Array.fill(2)(0f)
    val pts = IndexedSeq(v(1f, 0.00f), v(1f, 0.02f), v(0f, 1f), v(0.02f, 1f))
    val labels = Agglomerative.clusterLabels(pts, threshold = 0.01)
    assert(labels(0) == labels(1) && labels(2) == labels(3) && labels(0) != labels(2))
    // threshold 0 merges nothing; huge threshold merges all
    assert(Agglomerative.clusterLabels(pts, 0.0).distinct.length == 4)
    assert(Agglomerative.clusterLabels(pts, 2.1).distinct.length == 1)
  }

  test("refuses beyond the reference's 5000-doc cap") {
    val big = IndexedSeq.fill(Agglomerative.MaxDocs + 1)(Array(1f, 0f))
    val e = intercept[IllegalArgumentException](Agglomerative.clusterLabels(big, 0.5))
    assert(e.getMessage.contains("KMeans"))
  }
}
