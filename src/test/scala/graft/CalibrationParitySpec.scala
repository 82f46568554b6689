package graft

import graft.calib.Calibration
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Calibration port vs reference golden vectors. The reference stores
  * scores/edges as float32 (calibration.py:_as_np), so inputs are
  * float32-rounded before fitting and comparisons use small tolerances.
  */
class CalibrationParitySpec extends AnyFunSuite {

  private case class Case(name: String, scores: Array[Double], labels: Array[Int],
                          method: String, threshold: Double, brier: Double,
                          a: Option[Double], b: Option[Double],
                          edges: Array[Double], probs: Array[Double],
                          probe: Array[Double], applied: Array[Double])

  private lazy val cases: Seq[Case] = GoldenFixtures.lines("fixtures/calib_golden.jsonl").map { n =>
    def arr(f: String) = n.get(f).elements().asScala.map(_.asDouble()).toArray
    def optD(f: String) = Option(n.get(f)).filterNot(_.isNull).map(_.asDouble())
    Case(n.get("name").asText(), arr("scores"), n.get("labels").elements().asScala.map(_.asInt()).toArray,
      n.get("method").asText(), n.get("threshold").asDouble(), n.get("brier").asDouble(),
      optD("a"), optD("b"), arr("edges"), arr("probs"), arr("probe"), arr("applied"))
  }

  private def f32(x: Double): Double = x.toFloat.toDouble

  test("adaptive calibration picks the same method and threshold as the reference") {
    cases.foreach { c =>
      val scores = c.scores.map(f32)
      val p = Calibration.calibrateAdaptive(scores, c.labels)
      assert(p.method == c.method, s"${c.name}: method ${p.method} vs ${c.method}")
      assert(math.abs(p.threshold - c.threshold) < 2e-3,
        s"${c.name}: threshold ${p.threshold} vs ${c.threshold}")
      assert(math.abs(p.brier - c.brier) < 2e-3, s"${c.name}: brier ${p.brier} vs ${c.brier}")
      c.a.foreach(refA => assert(math.abs(p.a - refA) < 5e-2 * math.max(1, math.abs(refA)),
        s"${c.name}: platt a ${p.a} vs $refA"))
    }
  }

  test("applied calibration matches the reference on probe scores") {
    cases.foreach { c =>
      val scores = c.scores.map(f32)
      val p = Calibration.calibrateAdaptive(scores, c.labels)
      c.probe.zip(c.applied).foreach { case (s, ref) =>
        val ours = Calibration.applyParams(f32(s), p)
        assert(math.abs(ours - ref) < 5e-3,
          s"${c.name}: applied($s) = $ours vs ref $ref (method ${p.method})")
      }
    }
  }

  test("threshold selection honors the precision target") {
    cases.foreach { c =>
      val scores = c.scores.map(f32)
      val p = Calibration.calibrateAdaptive(scores, c.labels)
      val cal = scores.map(s => Calibration.applyParams(s, p))
      val sel = cal.zip(c.labels).filter(_._1 >= p.threshold)
      if (sel.nonEmpty && sel.exists(_._2 == 1)) {
        val prec = sel.count(_._2 == 1).toDouble / sel.length
        // feasible cases must meet the 0.98 target at the chosen cut
        if (c.name == "clean_binned") assert(prec >= 0.97, s"${c.name}: precision $prec")
      }
    }
  }

  test("reliability bins and ECE behave sanely") {
    val rng = new graft.pages.PagesSource.DetRng(5)
    val probs = Array.fill(5000)(rng.nextDouble())
    val labels = probs.map(p => if (rng.nextDouble() < p) 1 else 0)
    val e = Calibration.ece(probs, labels)
    assert(e >= 0 && e < 0.05, s"well-calibrated synthetic data should have tiny ECE, got $e")
    val bins = Calibration.reliabilityBins(probs, labels)
    assert(bins.size == 10 && bins.map(_.count).sum == 5000)
  }
}
