package graft.sa

/** Longest common substring via a generalized suffix array.
  *
  * The north-rule "suffix-array substring pass": candidate pairs that fail
  * the fast Jaccard/Hamming checks may still share one long verbatim span
  * (embedded boilerplate, block quotes). We build a suffix array over
  * a + SEP + b (prefix-doubling, O(n log n)), the LCP array (Kasai,
  * O(n)), and return the max LCP between lexicographically adjacent
  * suffixes that come from different sides. New work specified by
  * BASELINE.json — the reference has no substring pass (SURVEY.md scope
  * notes).
  */
object SuffixLCS extends Serializable {

  /** Length (in chars) of the longest common substring of a and b. */
  def longestCommonSubstring(a: String, b: String): Int = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0
    val n1 = a.length
    val n = n1 + 1 + b.length
    // Rank alphabet: chars of a, sentinel 0, chars of b. Normalized text
    // contains no NUL; map chars to code+1 to keep 0 as unique sentinel.
    val s = new Array[Int](n)
    var i = 0
    while (i < n1) { s(i) = a.charAt(i) + 1; i += 1 }
    s(n1) = 0
    i = 0
    while (i < b.length) { s(n1 + 1 + i) = b.charAt(i) + 1; i += 1 }

    val sa = suffixArray(s)
    val lcp = kasai(s, sa)

    var best = 0
    i = 1
    while (i < n) {
      val x = sa(i - 1)
      val y = sa(i)
      if ((x < n1) != (y < n1) && lcp(i) > best) best = lcp(i)
      i += 1
    }
    best
  }

  /** Prefix-doubling suffix array over an int sequence (values >= 0). */
  def suffixArray(s: Array[Int]): Array[Int] = {
    val n = s.length
    val sa = Array.tabulate(n)(identity)
    var rank = s.clone()
    var tmp = new Array[Int](n)
    var k = 1
    val boxed = sa.map(Integer.valueOf) // sort via java for speed/stability
    while (k < n) {
      val kk = k
      val r = rank
      val cmp = new java.util.Comparator[Integer] {
        override def compare(ai: Integer, bi: Integer): Int = {
          val x = ai.intValue(); val y = bi.intValue()
          if (r(x) != r(y)) return Integer.compare(r(x), r(y))
          val rx = if (x + kk < n) r(x + kk) else -1
          val ry = if (y + kk < n) r(y + kk) else -1
          Integer.compare(rx, ry)
        }
      }
      java.util.Arrays.sort(boxed, cmp)
      tmp(boxed(0)) = 0
      var i = 1
      while (i < n) {
        tmp(boxed(i)) = tmp(boxed(i - 1)) + (if (cmp.compare(boxed(i - 1), boxed(i)) < 0) 1 else 0)
        i += 1
      }
      val t = rank; rank = tmp; tmp = t
      if (rank(boxed(n - 1)) == n - 1) k = n // all ranks distinct -> done
      else k <<= 1
    }
    var i = 0
    while (i < n) { sa(i) = boxed(i).intValue(); i += 1 }
    sa
  }

  /** Kasai LCP: lcp(i) = LCP(suffix sa(i-1), suffix sa(i)); lcp(0) = 0. */
  def kasai(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }
}
