package graft.cc

/** X4: unsupervised agglomerative clustering — the reference's sub-5000-doc
  * path (`/root/reference/src/pipelines/classification/cli.py:190-224`):
  * average-linkage (UPGMA) over a precomputed cosine-distance matrix, with
  * the merge cutoff auto-derived as the 75th percentile of the nonzero
  * pairwise distances of the first min(1000, n) vectors. Above 5000 docs
  * the reference itself falls back to KMeans (`cli.py:192-198`) — that
  * path is `ann/Ann.ivfFit`/`assignToCentroids`; this object deliberately
  * refuses larger inputs rather than pretending O(n²) scales.
  *
  * DRIVER-SIDE BY CONTRACT, like the reference: n ≤ 5000 ⇒ the distance
  * matrix is ≤ 200 MB and the Anderberg argmin-cached UPGMA runs in
  * seconds. This is not a distributed operator and must never see a
  * corpus — the 100 TB path is KMeans/IVF; this exists for the reference's
  * own small-collection regime (labeling runs, eval sets).
  *
  * Parity notes (the sandbox has no sklearn, so the golden fixture
  * `fixtures/agglo_golden.jsonl` is a float64 numpy mirror of this exact
  * spec, the same construction the whitening fixture uses):
  *  - distances: d(i,j) = 1 − ⟨a,b⟩/(|a||b|), float64 over the float32
  *    embeddings (sklearn `cosine_distances` normalizes in float64 too).
  *  - threshold: numpy-linear 75th percentile over ALL ordered off-diagonal
  *    entries with d > 0 (the reference indexes the full square matrix, so
  *    each unordered pair counts twice and exact-duplicate pairs drop out).
  *  - merge rule: merge the globally closest pair while its average-linkage
  *    distance is < threshold (sklearn: "threshold at or above which
  *    clusters will not be merged"); average linkage is monotone (no
  *    inversions), so greedy-merge-until-threshold equals sklearn's
  *    build-tree-then-cut.
  *  - ties: broken by the lexicographically smallest cluster pair —
  *    sklearn's heap order is unspecified on exact ties; parity is
  *    therefore asserted on the PARTITION (label-invariant), and the
  *    fixture corpus has no distance ties between distinct texts.
  */
object Agglomerative extends Serializable {

  val MaxDocs = 5000

  /** float64 cosine distance of two float32 vectors (1 − cos). */
  def cosDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 // zero vectors are filtered by the caller (cli.py:160-166)
    else {
      val d = 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
      // Documented deviation: distances of identical/near-identical texts land
      // within a few ulps of 0 and the SIGN of that noise differs between
      // accumulation orders (numpy pairwise-BLAS vs this sequential loop),
      // flipping pairs in/out of the reference's `d > 0` percentile filter.
      // Clamp |d| < 1e-12 to exactly 0 — the fixture generator applies the
      // same clamp, making the threshold engine-independent.
      if (math.abs(d) < 1e-12) 0.0 else d
    }
  }

  /** numpy-linear percentile (np.percentile default interpolation). */
  def percentileLinear(sortedVals: Array[Double], q: Double): Double = {
    val m = sortedVals.length
    require(m > 0, "percentile of an empty set")
    val rank = q / 100.0 * (m - 1)
    val lo = math.floor(rank).toInt
    val hi = math.min(lo + 1, m - 1)
    val frac = rank - lo
    sortedVals(lo) + frac * (sortedVals(hi) - sortedVals(lo))
  }

  /** The reference's auto-threshold (cli.py:204-210): 75th percentile of
    * the strictly-positive entries of the FULL square cosine-distance
    * matrix of the first min(1000, n) vectors (each unordered pair twice).
    */
  def thresholdFromSample(vecs: IndexedSeq[Array[Float]], sampleSize: Int = 1000): Double = {
    val m = math.min(sampleSize, vecs.length)
    val vals = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < m) {
      var j = 0
      while (j < m) {
        if (i != j) {
          val d = cosDist(vecs(i), vecs(j))
          if (d > 0.0) vals += d
        }
        j += 1
      }
      i += 1
    }
    val arr = vals.toArray
    java.util.Arrays.sort(arr)
    percentileLinear(arr, 75.0)
  }

  /** UPGMA with threshold cut: merge the globally closest cluster pair
    * while its average-linkage distance is < threshold. Anderberg argmin
    * caching (per-cluster nearest-neighbor cache, lazily invalidated) —
    * O(n²) memory, ~O(n²) expected time. Returns labels renumbered by each
    * cluster's smallest member index (deterministic, engine-independent).
    */
  def clusterLabels(vecs: IndexedSeq[Array[Float]], threshold: Double): Array[Int] = {
    val n = vecs.length
    require(n <= MaxDocs,
      s"agglomerative is the reference's <= $MaxDocs-doc path (cli.py:192); " +
        s"got $n docs — use the KMeans/IVF path (ann/Ann) at scale")
    if (n == 0) return Array.empty
    val d = new Array[Double](n * n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val v = cosDist(vecs(i), vecs(j))
        d(i * n + j) = v; d(j * n + i) = v
        j += 1
      }
      i += 1
    }
    val active = Array.fill(n)(true)
    val size = Array.fill(n)(1)
    val members = Array.tabulate(n)(i => scala.collection.mutable.ArrayBuffer(i))
    val nnIdx = new Array[Int](n)
    val nnDist = new Array[Double](n)
    def recomputeNn(c: Int): Unit = {
      var best = -1; var bd = Double.MaxValue
      var k = 0
      while (k < n) {
        if (k != c && active(k)) {
          val v = d(c * n + k)
          if (v < bd) { bd = v; best = k } // ties -> lowest k (first seen)
        }
        k += 1
      }
      nnIdx(c) = best; nnDist(c) = bd
    }
    i = 0
    while (i < n) { recomputeNn(i); i += 1 }
    var remaining = n
    var continueMerging = remaining > 1
    while (continueMerging) {
      // global closest pair from the caches; ties -> smallest (lo, hi) pair
      var a = -1; var b = -1; var bd = Double.MaxValue
      var c = 0
      while (c < n) {
        if (active(c) && nnIdx(c) >= 0) {
          val v = nnDist(c)
          val lo = math.min(c, nnIdx(c)); val hi = math.max(c, nnIdx(c))
          val better = v < bd ||
            (v == bd && a >= 0 && (lo < math.min(a, b) ||
              (lo == math.min(a, b) && hi < math.max(a, b))))
          if (better || a < 0) { bd = v; a = lo; b = hi }
        }
        c += 1
      }
      if (a < 0 || bd >= threshold) continueMerging = false
      else {
        // merge b into a (a < b): weighted-average linkage update
        val sa = size(a); val sb = size(b)
        var k = 0
        while (k < n) {
          if (k != a && k != b && active(k)) {
            val v = (sa * d(a * n + k) + sb * d(b * n + k)) / (sa + sb)
            d(a * n + k) = v; d(k * n + a) = v
          }
          k += 1
        }
        active(b) = false
        size(a) = sa + sb
        members(a) ++= members(b)
        members(b).clear()
        remaining -= 1
        if (remaining <= 1) continueMerging = false
        else {
          recomputeNn(a)
          k = 0
          while (k < n) {
            if (k != a && active(k)) {
              if (nnIdx(k) == a || nnIdx(k) == b) recomputeNn(k) // may have grown
              else if (d(a * n + k) < nnDist(k)) { nnIdx(k) = a; nnDist(k) = d(a * n + k) }
            }
            k += 1
          }
        }
      }
    }
    // labels: clusters numbered by smallest member index ascending
    val labels = new Array[Int](n)
    var next = 0
    (0 until n).foreach { c =>
      if (active(c) && members(c).nonEmpty) {
        members(c).foreach(m => labels(m) = next)
        next += 1
      }
    }
    labels
  }

  /** The reference's full auto path: threshold from the leading sample,
    * then the UPGMA cut. Returns (threshold, labels).
    */
  def clusterAuto(vecs: IndexedSeq[Array[Float]], sampleSize: Int = 1000): (Double, Array[Int]) = {
    val t = thresholdFromSample(vecs, sampleSize)
    (t, clusterLabels(vecs, t))
  }
}
