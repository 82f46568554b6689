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
}
