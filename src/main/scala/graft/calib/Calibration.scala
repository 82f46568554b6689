package graft.calib

/** Score calibration — Scala port of the reference's driver-side math
  * (/root/reference/src/training/calibration.py): adaptive Platt vs
  * quantile-binned isotonic-ish calibration, precision-targeted threshold
  * selection, reliability bins / Brier / ECE.
  *
  * All fits run on the driver over a bounded bootstrap sample (the
  * reference caps at 50k+50k pairs — near_duplicate.py:40-47); scoring the
  * bootstrap is distributed, fitting a 2-parameter logistic or ~20 bin
  * rates is not a distributed problem.
  */
object Calibration {

  final case class Params(method: String, a: Double, b: Double,
                          edges: Array[Double], probs: Array[Double],
                          threshold: Double, brier: Double)

  final case class ReliabilityBin(probCenter: Double, expectedPosRate: Double,
                                  observedPosRate: Double, count: Long)

  @inline def sigmoid(z0: Double): Double = {
    val z = math.max(-60.0, math.min(60.0, z0))
    1.0 / (1.0 + math.exp(-z))
  }

  /** np.quantile(scores, q, method="linear") over a sorted array. */
  private def quantileLinear(sorted: Array[Double], q: Double): Double = {
    val n = sorted.length
    if (n == 1) return sorted(0)
    val pos = q * (n - 1)
    val lo = math.floor(pos).toInt
    val hi = math.min(lo + 1, n - 1)
    val t = pos - lo
    sorted(lo) * (1 - t) + sorted(hi) * t
  }

  /** _fit_quantile_binned — calibration.py:265-308. */
  def fitQuantileBinned(scores: Array[Double], labels: Array[Int],
                        nBins: Int = 20): (Array[Double], Array[Double]) = {
    if (scores.isEmpty) {
      val edges = Array.tabulate(nBins + 1)(i => i.toDouble / nBins)
      val probs = Array.tabulate(nBins)(i => i.toDouble / (nBins - 1).max(1))
      return (edges, probs)
    }
    val sorted = scores.clone().sorted
    var edges = (0 to nBins).map(i => quantileLinear(sorted, i.toDouble / nBins)).distinct.toArray
    if (edges.head > 0.0) edges = 0.0 +: edges
    if (edges.last < 1.0) edges = edges :+ 1.0
    val nb = math.max(1, edges.length - 1)
    val pos = new Array[Double](nb)
    val cnt = new Array[Double](nb)
    var i = 0
    while (i < scores.length) {
      val idx = math.min(nb - 1, math.max(0, searchRight(edges, scores(i)) - 1))
      pos(idx) += math.max(0.0, math.min(1.0, labels(i).toDouble))
      cnt(idx) += 1
      i += 1
    }
    val probs = Array.tabulate(nb)(j => (pos(j) + 1.0) / (cnt(j) + 2.0))
    i = 1
    while (i < nb) { if (probs(i) < probs(i - 1)) probs(i) = probs(i - 1); i += 1 }
    (edges, probs)
  }

  /** np.searchsorted(edges, x, side="right"). */
  private def searchRight(edges: Array[Double], x: Double): Int = {
    var lo = 0
    var hi = edges.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (edges(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** _calibrated_prob_binned — calibration.py:311-326. */
  def applyBinned(score: Double, edges: Array[Double], probs: Array[Double]): Double = {
    if (edges.isEmpty) return math.max(0.0, math.min(1.0, score))
    val nb = probs.length
    val i = math.min(nb - 1, math.max(0, searchRight(edges, score) - 1))
    val left = edges(i)
    val right = edges(i + 1)
    if (right > left) {
      val t = (score - left) / (right - left)
      (1 - t) * probs(i) + t * probs(math.min(i + 1, nb - 1))
    } else probs(i)
  }

  /** _fit_platt_reg — Newton/IRLS with L2, calibration.py:329-364. */
  def fitPlatt(scores: Array[Double], labels: Array[Int], l2: Double = 1.0,
               iters: Int = 200, lr: Double = 0.2): (Double, Double) = {
    var a = 0.0
    var b = 0.0
    val n = scores.length
    var it = 0
    var done = false
    while (it < math.max(1, iters) && !done) {
      // H = X^T W X + lam I (2x2), g = X^T (p - y) + lam w
      var h00 = l2; var h01 = 0.0; var h11 = l2
      var g0 = l2 * a; var g1 = l2 * b
      var allTiny = true
      var i = 0
      while (i < n) {
        val x = scores(i)
        val p = sigmoid(a * x + b)
        val w = p * (1.0 - p)
        if (w >= 1e-12) allTiny = false
        h00 += w * x * x; h01 += w * x; h11 += w
        val d = p - math.max(0.0, math.min(1.0, labels(i).toDouble))
        g0 += d * x; g1 += d
        i += 1
      }
      if (allTiny) done = true
      else {
        val det = h00 * h11 - h01 * h01
        val (d0, d1) =
          if (math.abs(det) < 1e-300) (g0, g1)
          else ((h11 * g0 - h01 * g1) / det, (h00 * g1 - h01 * g0) / det)
        a -= lr * d0
        b -= lr * d1
        if (math.sqrt(d0 * d0 + d1 * d1) < 1e-8) done = true
      }
      it += 1
    }
    (a, b)
  }

  /** _choose_threshold_by_precision — calibration.py:373-426 (mode="max"). */
  def chooseThresholdByPrecision(probs: Array[Double], labels: Array[Int],
                                 targetPrecision: Double): Double = {
    if (probs.isEmpty) return 0.5
    val order = probs.indices.sortBy(i => -probs(i))
    // Exactly like the reference: cumulative precision over descending
    // probs, evaluated at change points (first row of each tie block).
    val p = order.map(probs(_)).toArray
    val y = order.map(labels(_)).toArray
    val cumPos = new Array[Long](p.length)
    var acc = 0L
    var j = 0
    while (j < p.length) { acc += y(j); cumPos(j) = acc; j += 1 }
    var found = false
    var th = 0.0
    j = 0
    while (j < p.length) {
      if (j == 0 || p(j) != p(j - 1)) {
        val prec = cumPos(j).toDouble / (j + 1)
        if (prec >= targetPrecision) {
          val cand = p(j)
          if (!found || cand > th) { th = cand; found = true }
        }
      }
      j += 1
    }
    if (!found) {
      val posProbs = probs.indices.filter(labels(_) == 1).map(probs(_))
      if (posProbs.nonEmpty) math.min(posProbs.max - 1e-3, 0.999) else 0.999
    } else math.min(th, 1.0 - 1e-6)
  }

  def brier(probs: Array[Double], labels: Array[Int]): Double = {
    if (probs.isEmpty) return 0.0
    var s = 0.0
    var i = 0
    while (i < probs.length) { val d = probs(i) - labels(i); s += d * d; i += 1 }
    s / probs.length
  }

  /** _reliability_bins — fixed-width 10 bins, calibration.py:429-456. */
  def reliabilityBins(probs: Array[Double], labels: Array[Int], nBins: Int = 10): Seq[ReliabilityBin] = {
    val cnt = new Array[Long](nBins)
    val pos = new Array[Double](nBins)
    var i = 0
    while (i < probs.length) {
      val b = math.min(nBins - 1, math.max(0, (probs(i) * nBins).toInt))
      cnt(b) += 1
      pos(b) += labels(i)
      i += 1
    }
    (0 until nBins).map { b =>
      val center = (b + 0.5) / nBins
      ReliabilityBin(center, center, if (cnt(b) > 0) pos(b) / cnt(b) else 0.0, cnt(b))
    }
  }

  /** Expected calibration error — metrics.py:806-829. */
  def ece(probs: Array[Double], labels: Array[Int], nBins: Int = 10): Double = {
    if (probs.isEmpty) return 0.0
    val bins = reliabilityBins(probs, labels, nBins)
    bins.map(b => b.count.toDouble / probs.length * math.abs(b.observedPosRate - b.expectedPosRate)).sum
  }

  /** calibrate_adaptive_and_select_threshold — calibration.py:19-83. */
  def calibrateAdaptive(scores: Array[Double], labels: Array[Int],
                        targetPrecision: Double = 0.98, nBins: Int = 20,
                        tinyCutoff: Int = 120, minPos: Int = 5, minNeg: Int = 5): Params = {
    val n = scores.length
    val pos = labels.count(_ == 1)
    val neg = labels.count(_ == 0)
    if (n == 0 || pos == 0 || neg == 0)
      return Params("none", 0, 0, Array.empty, Array.empty, math.min(0.95, 1 - 1e-6), 0.25)
    if (n < tinyCutoff || pos < minPos || neg < minNeg) {
      val (a, b) = fitPlatt(scores, labels)
      val cal = scores.map(s => sigmoid(a * s + b))
      val th = math.min(chooseThresholdByPrecision(cal, labels, targetPrecision), 1 - 1e-6)
      return Params("platt", a, b, Array.empty, Array.empty, th, brier(cal, labels))
    }
    val (edges, probs) = fitQuantileBinned(scores, labels, math.max(6, nBins))
    val cal = scores.map(s => applyBinned(s, edges, probs))
    val th = math.min(chooseThresholdByPrecision(cal, labels, targetPrecision), 1 - 1e-6)
    Params("isotonic", 0, 0, edges, probs, th, brier(cal, labels))
  }

  /** apply_binning_or_platt — calibration.py:148-158. */
  def applyParams(raw: Double, p: Params): Double = p.method match {
    case "platt" => sigmoid(p.a * raw + p.b)
    case _ if p.edges.nonEmpty && p.probs.nonEmpty => applyBinned(raw, p.edges, p.probs)
    case _ => math.max(0.0, math.min(1.0, raw))
  }
}
