package graft.norm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

/** Text normalization \u2014 byte-identical port of the reference's
  * preprocessing chain (/root/reference/src/features/text_preproc.py:20-170,
  * /root/reference/src/ensemble/arbiter.py:198-218).
  *
  * Parity notes (verified against golden vectors generated from the
  * reference Python in `fixtures/norm_golden.tsv`):
  *  - Python `re` classes `\w \s \d \b` are Unicode-aware by default; Java
  *    needs UNICODE_CHARACTER_CLASS \u2014 every pattern below sets it.
  *  - Python `re.MULTILINE` `^` only matches after `\n`; Java by default
  *    also matches after `\r`, U+0085, U+2028, U+2029 \u2014 UNIX_LINES restores
  *    Python semantics for the bullet-prefix pattern.
  *  - `str.lower()` ≈ `toLowerCase(Locale.ROOT)` (both implement the
  *    Unicode full case mapping incl. Final_Sigma).
  */
object TextNorm extends Serializable {

  private final val U = Pattern.UNICODE_CHARACTER_CLASS

  // text_preproc.py:14-17
  val DefaultStopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "for", "of", "to", "in", "on", "at", "by",
    "with", "from", "as", "is", "are", "was", "were", "be", "been", "it",
    "this", "that", "these", "those", "you", "your")

  // text_preproc.py:20-40
  private val SentSplit = Pattern.compile("(?<=[.!?])\\s+|\\n+", U)
  private val PageNum =
    Pattern.compile("\\bpage\\s+\\d+(\\s+of\\s+\\d+)?\\b",
      Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE | U)
  private val Hr = Pattern.compile("\\n-{2,}\\n", U)
  private val SoftHyphenEol = Pattern.compile("-\\n", U)
  private val MultiSpace = Pattern.compile("\\s+", U)
  private val DateRe = Pattern.compile("\\b\\d{4}-\\d{2}-\\d{2}\\b", U)
  private val LongId = Pattern.compile("\\b\\d{6,}\\b", U)
  private val SoftHyphenChar = Pattern.compile("\u00AD")
  private val Nbsp = Pattern.compile("\u00A0")
  private val LineHyphen = Pattern.compile("(?<=\\w)-\\s*(?:\\r?\\n|\\r)\\s*(?=\\w)", U)
  private val MultiNl = Pattern.compile("(?:\\r?\\n){2,}", U)
  private val BulletPrefix = Pattern.compile("^[\u2022\u2023\u25E6\\-\\*\u00B7]\\s+",
    Pattern.MULTILINE | Pattern.UNIX_LINES | U)
  private val NonWordSpace = Pattern.compile("[^\\w\\s]", U)
  private val FullDate = Pattern.compile("\\d{4}-\\d{2}-\\d{2}", U)
  private val FullLongId = Pattern.compile("\\d{6,}", U)

  /** normalize_text \u2014 text_preproc.py:70-122. */
  def normalize(text: String, strict: Boolean = true, stripDatesIds: Boolean = true): String = {
    if (text == null || text.isEmpty) return ""
    var t = Normalizer.normalize(text, Normalizer.Form.NFKC)
    t = SoftHyphenChar.matcher(t).replaceAll("")
    t = Nbsp.matcher(t).replaceAll(" ")
    t = t.replace('\u2013', '-').replace('\u2014', '-')
    t = t.replace('\u2018', '\'').replace('\u2019', '\'')
    t = t.replace('\u201C', '"').replace('\u201D', '"')
    t = PageNum.matcher(t).replaceAll(" ")
    t = Hr.matcher(t).replaceAll("\n")
    t = LineHyphen.matcher(t).replaceAll("")
    t = SoftHyphenEol.matcher(t).replaceAll("")
    t = BulletPrefix.matcher(t).replaceAll("")
    t = MultiNl.matcher(t).replaceAll("\n")
    if (strict) t = NonWordSpace.matcher(t).replaceAll(" ")
    if (stripDatesIds) {
      t = DateRe.matcher(t).replaceAll(" ")
      t = LongId.matcher(t).replaceAll(" ")
    }
    MultiSpace.matcher(t).replaceAll(" ").strip().toLowerCase(Locale.ROOT)
  }

  /** Python `str.split()`: split on runs of whitespace, no empty tokens. */
  private def pySplit(s: String): Array[String] = {
    val trimmed = s.strip()
    if (trimmed.isEmpty) Array.empty else MultiSpace.split(trimmed)
  }

  /** tokenize_words \u2014 text_preproc.py:126-151 (assume_normalized path used
    * by build_document_view: the input is already `normalize` output).
    */
  def tokenize(normText: String, minLen: Int = 2, removeStopwords: Boolean = true,
               stopwords: Set[String] = DefaultStopwords): Array[String] =
    pySplit(normText).filter(t => t.length >= minLen && !(removeStopwords && stopwords(t)))

  /** SimHash-side tokenizer \u2014 simhash_model.py:55-75 with the learner's
    * defaults: min_len=2, EMPTY stopword set, strict=False, strip_ids=False.
    * Input is the normalized doc text; `.lower()` there is a no-op on it but
    * we keep it for standalone use.
    */
  def simhashTokens(text: String, minLen: Int = 2, strict: Boolean = false,
                    stripIds: Boolean = false, stopwords: Set[String] = Set.empty): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    var s = text.toLowerCase(Locale.ROOT)
    if (strict) s = NonWordSpace.matcher(s).replaceAll(" ")
    pySplit(s).filter { t =>
      !(stripIds && (FullLongId.matcher(t).matches() || FullDate.matcher(t).matches())) &&
        t.length >= minLen && !stopwords(t)
    }
  }

  /** Word k-shingles, space joiner \u2014 minhash_model.py:79-85. */
  def wordShingles(tokens: Array[String], k: Int): Array[String] = {
    if (k <= 1) return tokens.clone()
    if (tokens.length < k) return Array.empty
    val out = new Array[String](tokens.length - k + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** Word k-shingles with U+241F joiner \u2014 simhash_model.py:77-82. */
  def wordShinglesUnitSep(tokens: Array[String], k: Int): Array[String] = {
    if (k <= 1) return tokens.clone()
    if (tokens.length - k + 1 <= 0) return Array.empty
    (0 to tokens.length - k).map(i => tokens.slice(i, i + k).mkString("\u241F")).toArray
  }

  /** Overlapping char k-grams \u2014 minhash_model.py:87-91. */
  def charShingles(s: String, k: Int): Array[String] = {
    if (s == null || s.isEmpty || k <= 0 || s.length < k) return Array.empty
    (0 to s.length - k).map(i => s.substring(i, i + k)).toArray
  }

  private val FileExt = Pattern.compile("\\.[A-Za-z0-9]{1,6}$")
  private val NonWordRuns = Pattern.compile("[^\\w]+", U)

  /** filename_tokens \u2014 text_preproc.py:163-170: basename (both
    * separators), drop a short extension, non-word runs \u2192 space, strip,
    * lower, keep tokens that are not pure digits and have length >= 2,
    * first 20.
    */
  def filenameTokens(filename: String): Array[String] = {
    if (filename == null || filename.isEmpty) return Array.empty
    var name = filename.substring(filename.lastIndexOf('/') + 1)
    name = name.substring(name.lastIndexOf('\\') + 1)
    name = FileExt.matcher(name).replaceAll("")
    name = NonWordRuns.matcher(name).replaceAll(" ").strip().toLowerCase(Locale.ROOT)
    pySplit(name)
      .filter(t => t.nonEmpty && !t.forall(Character.isDigit) && t.length >= 2)
      .take(20)
  }

  /** drop_repeating_lines \u2014 text_preproc.py:55-67. */
  def dropRepeatingLines(text: String, minCount: Int = 3, maxLen: Int = 120): String = {
    if (text == null || text.isEmpty) return ""
    // Python splitlines() splits on a wider set than \n; our inputs are
    // \n/\r\n/\r only, which it handles identically to this — EXCEPT that
    // splitlines yields no trailing element after a final terminator,
    // while Java's limit=-1 split keeps one: drop it.
    val parts = text.split("\r\n|\r|\n", -1)
    val trimmed =
      if (parts.last.isEmpty && (text.endsWith("\n") || text.endsWith("\r")))
        parts.dropRight(1)
      else parts
    val lines = trimmed.map(_.strip())
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    lines.foreach(ln => if (ln.nonEmpty) counts.update(ln, counts.getOrElse(ln, 0) + 1))
    val repetitive = counts.collect {
      case (ln, c) if c >= minCount && ln.length <= maxLen => ln
    }.toSet
    if (repetitive.isEmpty) lines.mkString("\n")
    else lines.filterNot(repetitive).mkString("\n")
  }

  /** sentence_split \u2014 text_preproc.py:154-160. */
  def sentenceSplit(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    SentSplit.split(text).map(_.strip()).filter(_.nonEmpty)
  }

  /** Exact-duplicate canonicalization \u2014 arbiter.py:198-218 ("unicode_lines"):
    * CRLF/CR → LF, strip leading BOMs, NFC.
    */
  def canonicalizeExact(s: String): String = {
    if (s == null) return ""
    var t = s.replace("\r\n", "\n").replace('\r', '\n')
    while (t.startsWith("\uFEFF")) t = t.substring(1)
    Normalizer.normalize(t, Normalizer.Form.NFC)
  }

  private def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xFF}%02x"))
    sb.toString
  }

  /** sha256 of canonicalized text \u2014 arbiter.py:212-218. */
  def exactHash(text: String): String = sha256Hex(canonicalizeExact(text))

  /** content_hash \u2014 text_preproc.py:248-253. */
  def contentHash(normText: String): String = sha256Hex(if (normText == null) "" else normText)
}
