package graft.lsh

/** LSH banding parameters (b bands × r rows).
  *
  * Port of datasketch MinHashLSH's `_optimal_param` (public datasketch
  * source; used by the reference at
  * /root/reference/src/pipelines/near_duplicate.py:395 with threshold=0.6,
  * num_perm=64): choose (b, r) with b*r <= num_perm minimizing
  * 0.5*P(false positive) + 0.5*P(false negative), probabilities integrated
  * with a fixed 0.001-step midpoint rule.
  */
object LshParams {

  final case class BandsRows(b: Int, r: Int)

  private def integrate(f: Double => Double, a: Double, b: Double): Double = {
    val p = 0.001
    var area = 0.0
    var x = a
    while (x < b) {
      area += f(x + 0.5 * p) * p
      x += p
    }
    area
  }

  def optimal(threshold: Double, numPerm: Int,
              fpWeight: Double = 0.5, fnWeight: Double = 0.5): BandsRows = {
    var minError = Double.PositiveInfinity
    var opt = BandsRows(0, 0)
    var b = 1
    while (b <= numPerm) {
      val maxR = numPerm / b
      var r = 1
      while (r <= maxR) {
        val fp = integrate(s => 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble), 0.0, threshold)
        val fn = integrate(s => math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble), threshold, 1.0)
        val err = fp * fpWeight + fn * fnWeight
        if (err < minError) {
          minError = err
          opt = BandsRows(b, r)
        }
        r += 1
      }
      b += 1
    }
    opt
  }
}
