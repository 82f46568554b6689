package graft.text

import graft.hash.XXH64
import java.util.Locale

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (n-gram/stopword heuristic), quality scoring, token
  * counting, and rolling-hash document fingerprinting. All pure functions
  * used from codegen-friendly column expressions or mapPartitions.
  */
object TextOps extends Serializable {

  /** Tiny per-language marker sets (function words). A real deployment
    * would use fastText-style n-gram models; the heuristic keeps the Spark
    * plumbing (schema, partitioning) identical while staying dependency-free.
    */
  /** Ordered: earlier languages win hit-count ties deterministically
    * ("zh" is handled by the CJK codepoint-ratio rule, not markers).
    */
  val Markers: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it", "was", "for", "with", "this"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von", "auf", "zu"),
    "fr" -> Set("le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans", "des", "du"),
    "es" -> Set("el", "la", "los", "las", "es", "no", "una", "para", "que", "en", "del", "por"))

  /** Heuristic language ID: CJK codepoint ratio first, then function-word
    * hit counts; "und" (undetermined) when no evidence.
    */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var total = 0
    var i = 0
    val n = math.min(text.length, 4000)
    while (i < n) {
      val cp = text.codePointAt(i)
      if (!Character.isWhitespace(cp)) {
        total += 1
        val block = Character.UnicodeScript.of(cp)
        if (block == Character.UnicodeScript.HAN || block == Character.UnicodeScript.HIRAGANA ||
          block == Character.UnicodeScript.KATAKANA || block == Character.UnicodeScript.HANGUL) cjk += 1
      }
      i += Character.charCount(cp)
    }
    if (total > 0 && cjk.toDouble / total > 0.25) return "zh"
    val toks = text.toLowerCase(Locale.ROOT).split("\\s+").take(500)
    var best = "und"
    var bestHits = 0
    Markers.foreach { case (lang, set) =>
      var hits = 0
      toks.foreach(t => if (set(t.replaceAll("[^\\p{L}]", ""))) hits += 1)
      if (hits > bestHits) { bestHits = hits; best = lang }
    }
    if (bestHits >= 2) best else "und"
  }

  /** Whitespace token count (the SQL-oracle-checkable definition). */
  def tokenCount(text: String): Int = {
    if (text == null) return 0
    val t = text.trim
    if (t.isEmpty) 0 else t.split("\\s+").length
  }

  /** BPE-ish subword count estimate: words are split at letter/digit
    * boundaries and every 4 chars — a cheap, deterministic proxy for
    * tokenizer budgeting at corpus scale.
    */
  def subwordCount(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    var count = 0
    val m = java.util.regex.Pattern.compile("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]").matcher(text)
    while (m.find()) {
      val len = m.end() - m.start()
      count += math.max(1, (len + 3) / 4)
    }
    count
  }

  /** Quality features for filter pipelines (C4/Gopher-style signals). */
  final case class Quality(n_chars: Int, n_tokens: Int, mean_token_len: Double,
                           alpha_ratio: Double, digit_ratio: Double, punct_ratio: Double,
                           stopword_ratio: Double, max_line_len: Int, score: Double)

  def quality(text: String): Quality = {
    if (text == null || text.isEmpty) return Quality(0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0, 0.0)
    val n = text.length
    var alpha = 0; var digit = 0; var punct = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) alpha += 1
      else if (Character.isDigit(c)) digit += 1
      else if (!Character.isWhitespace(c)) punct += 1
      i += 1
    }
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val sw = graft.norm.TextNorm.DefaultStopwords
    val swHits = toks.count(t => sw(t.toLowerCase(Locale.ROOT)))
    val meanTok = if (toks.isEmpty) 0.0 else toks.map(_.length).sum.toDouble / toks.length
    val maxLine = text.split("\n", -1).foldLeft(0)((m, l) => math.max(m, l.length))
    val alphaR = alpha.toDouble / n
    val digitR = digit.toDouble / n
    val punctR = punct.toDouble / n
    val swR = if (toks.isEmpty) 0.0 else swHits.toDouble / toks.length
    // simple monotone score in [0,1]: rewards alpha text with sane token
    // lengths and some stopwords, penalizes digit/punct walls
    val score = math.max(0.0, math.min(1.0,
      0.4 * alphaR + 0.2 * math.min(1.0, swR * 4) +
        0.2 * (if (meanTok >= 3 && meanTok <= 10) 1.0 else 0.0) +
        0.2 * (1.0 - math.min(1.0, digitR * 5 + punctR * 2))))
    Quality(n, toks.length, meanTok, alphaR, digitR, punctR, swR, maxLine, score)
  }

  /** Rolling-hash document fingerprint: xxh64 over 8-gram windows of the
    * whitespace-split tokens, combined with min/xor — a winnowing-style
    * sketch for cheap containment checks.
    */
  def fingerprint(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    val toks = text.trim.split("\\s+")
    if (toks.isEmpty) return 0L
    var acc = 0L
    var minH = Long.MaxValue
    val w = 8
    var i = 0
    while (i < toks.length) {
      val until = math.min(toks.length, i + w)
      var h = 0x9E3779B97F4A7C15L
      var j = i
      while (j < until) { h = h * 1099511628211L ^ XXH64.hashString(toks(j), 0L); j += 1 }
      acc ^= h
      if (h < minH) minH = h
      i += w
    }
    acc ^ java.lang.Long.rotateLeft(minH, 17)
  }

  /** T3 — shared-shingle rationale (minhash_model.py:395-407): exact
    * Jaccard over shingle STRING sets plus a 5-shingle sample of the
    * intersection and overlap/universe sizes, for human-facing evidence on
    * decided pairs (never the hot path — the pipeline carries hashed
    * shingles). The reference samples the intersection in Python-set
    * iteration order (unspecified); we take the lexicographically first 5
    * — deterministic, same information.
    */
  def sharedShingleRationale(tokensA: Array[String], tokensB: Array[String],
                             k: Int): (Double, Seq[String], Int, Int) = {
    val sa = graft.norm.TextNorm.wordShingles(tokensA, k).toSet
    val sb = graft.norm.TextNorm.wordShingles(tokensB, k).toSet
    val inter = sa.intersect(sb)
    val union = sa.size + sb.size - inter.size
    val j = if (union == 0) 0.0 else inter.size.toDouble / union
    (j, inter.toSeq.sorted.take(5), inter.size, union)
  }

  /** SimHash-based 64-bit near-dup fingerprint over word 2-shingles —
    * cheap per-doc signature for blocking.
    */
  def simhash64(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    val toks = text.toLowerCase(Locale.ROOT).trim.split("\\s+")
    val v = new Array[Int](64)
    var i = 0
    while (i < toks.length - 1) {
      val h = XXH64.hashString(toks(i) + " " + toks(i + 1), 7L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) v(b) += 1 else v(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (v(b) >= 0) out |= 1L << b; b += 1 }
    out
  }
}
