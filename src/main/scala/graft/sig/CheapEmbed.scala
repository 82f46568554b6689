package graft.sig

/** Deterministic character-hash embedding — port of the reference's
  * embedding fallback (/root/reference/src/Learners/embed_model.py:66-87):
  * rolling hash `h = (h*1315423911 + codepoint + index) mod 2^64` scattering
  * +1.0 counts into a `dim`-length vector, then L2-normalized (float32).
  *
  * Python iterates code points (not UTF-16 units); we do the same.
  */
object CheapEmbed extends Serializable {

  final val DefaultDim = 384

  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null || text.isEmpty) return v
    var h = 0L
    var i = 0 // char index
    var j = 0 // code point index (Python's enumerate index)
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      h = h * 1315423911L + cp.toLong + j.toLong // wraps = mod 2^64
      val idx = java.lang.Long.remainderUnsigned(h, dim.toLong).toInt
      v(idx) += 1.0f
      i += Character.charCount(cp)
      j += 1
    }
    // L2 normalize. numpy accumulates in float32 with pairwise summation;
    // we accumulate in double (strictly more accurate). Decision thresholds
    // sit far from the resulting <=1e-6 cosine differences.
    var ss = 0.0
    var k = 0
    while (k < dim) { ss += v(k).toDouble * v(k).toDouble; k += 1 }
    val norm = math.sqrt(ss)
    if (norm > 0) {
      k = 0
      while (k < dim) { v(k) = (v(k) / norm).toFloat; k += 1 }
    }
    v
  }

  /** Dot product of two L2-normalized vectors = cosine
    * (embed_model.py:223-227: `cos = dot(e1, e2)`, 0.0 if both zero).
    */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Unit-interval mapping — embed_model.py:62-64. */
  def cosToUnit(cos: Double): Double = (cos + 1.0) * 0.5

  /** Domain-whitening parameters (embed_model.py:98-104 `_State.mean` /
    * `_State.top_pc`). The reference only ever LOADS these from persisted
    * state (`load_state`, embed_model.py:169-172) — it ships no fit — so
    * [[fitWhiten]] below defines the fit: sample mean + top principal
    * component by deterministic power iteration, the standard
    * all-but-the-top construction (Arora et al. 2017) the reference's
    * "remove top PCs to reduce topical bias" comment (arbiter.py:51)
    * names. Both vectors are float32, matching the reference's persisted
    * form.
    */
  final case class WhitenParams(mean: Array[Float], topPc: Array[Float])

  /** Driver-side whitening fit over a BOUNDED embedding sample (the
    * calibration sample — ≤100k rows by the Bootstrap caps, so the
    * collect the caller did is already bounded; this never sees the
    * corpus). Deterministic: mean accumulates in float64 in input order;
    * the top PC is 100 power-iteration steps on the centered sample
    * starting from the basis vector of the max-variance coordinate
    * (lowest index on ties), sign-fixed so the largest-|v| component is
    * positive. A float64 numpy mirror (fixtures/gen_golden_whiten.py)
    * reproduces it to ~1e-6 — WhitenParitySpec pins the parity.
    */
  def fitWhiten(samples: IndexedSeq[Array[Float]], dim: Int = DefaultDim,
                iters: Int = 100): WhitenParams = {
    require(samples.nonEmpty, "whitening fit needs a nonempty sample")
    val n = samples.length
    val acc = new Array[Double](dim)
    samples.foreach { v =>
      var i = 0
      while (i < dim) { acc(i) += v(i); i += 1 }
    }
    val mean = Array.tabulate(dim)(i => (acc(i) / n).toFloat)
    // centered copies in float32 (the precision the apply path sees)
    val centered = samples.map { v =>
      Array.tabulate(dim)(i => v(i) - mean(i))
    }
    // start = basis vector at the max-variance coordinate
    val varAcc = new Array[Double](dim)
    centered.foreach { c =>
      var i = 0
      while (i < dim) { varAcc(i) += c(i).toDouble * c(i).toDouble; i += 1 }
    }
    var j0 = 0
    var i = 1
    while (i < dim) { if (varAcc(i) > varAcc(j0)) j0 = i; i += 1 }
    var v = new Array[Double](dim)
    v(j0) = 1.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](dim)
      centered.foreach { c =>
        var d = 0.0
        var k = 0
        while (k < dim) { d += c(k) * v(k); k += 1 }
        k = 0
        while (k < dim) { w(k) += d * c(k); k += 1 }
      }
      var ss = 0.0
      var k = 0
      while (k < dim) { ss += w(k) * w(k); k += 1 }
      val nw = math.sqrt(ss)
      if (nw == 0.0) it = iters // degenerate sample: keep current v
      else {
        k = 0
        while (k < dim) { v(k) = w(k) / nw; k += 1 }
      }
      it += 1
    }
    // deterministic sign: largest-|v| component (lowest index on ties) > 0
    var jm = 0
    i = 1
    while (i < dim) { if (math.abs(v(i)) > math.abs(v(jm))) jm = i; i += 1 }
    if (v(jm) < 0) { i = 0; while (i < dim) { v(i) = -v(i); i += 1 } }
    WhitenParams(mean, v.map(_.toFloat))
  }

  /** Mirror of `_apply_whiten` (embed_model.py:550-566) with params
    * present and whiten + remove_top_pc enabled: subtract the domain
    * mean, remove the projection on the top PC, re-normalize (zero
    * vectors stay zero). Arithmetic is float32 like the reference; the
    * dot products accumulate in float64 (strictly more accurate than
    * numpy's float32 pairwise sums — same documented deviation as
    * [[embed]]'s norm).
    */
  def applyWhiten(v: Array[Float], p: WhitenParams): Array[Float] = {
    val dim = v.length
    val w = new Array[Float](dim)
    var i = 0
    while (i < dim) { w(i) = v(i) - p.mean(i); i += 1 }
    var d = 0.0
    i = 0
    while (i < dim) { d += w(i).toDouble * p.topPc(i).toDouble; i += 1 }
    val df = d.toFloat
    i = 0
    while (i < dim) { w(i) = w(i) - df * p.topPc(i); i += 1 }
    var ss = 0.0
    i = 0
    while (i < dim) { ss += w(i).toDouble * w(i).toDouble; i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm > 0) { i = 0; while (i < dim) { w(i) = (w(i) / nrm).toFloat; i += 1 } }
    w
  }

  /** Whitened cosine of two raw embeddings — the `embed_whiten`
    * escalation rescore (arbiter.py:640-642 sets whiten + remove_top_pc,
    * then re-scores; embed_model.py:208-227 embeds, whitens, dots).
    */
  def whitenedCosine(a: Array[Float], b: Array[Float], p: WhitenParams): Double =
    cosine(applyWhiten(a, p), applyWhiten(b, p))
}
