package graft.pages

import graft.model.Schemas.Page
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Builders for the engine's input table
  * (url, warc_ts, html, text, lang) — BASELINE.json input_hint shape.
  *
  * Everything here is deterministic: page derivation is a pure function of
  * (doc_id, variant index) via splitmix64 — no Random, no wall clock — so
  * reruns, repartitions and the two bench parallelism levels all see
  * byte-identical input.
  */
object PagesSource {

  /** splitmix64 — public-domain mixing constants (Steele et al.). */
  @inline def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  final class DetRng(seed: Long) {
    private var state = seed
    def nextLong(): Long = { state += 0x9E3779B97F4A7C15L; mix64(state) }
    def nextInt(bound: Int): Int =
      (java.lang.Long.remainderUnsigned(nextLong(), bound.toLong)).toInt
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
  }

  private val EpochMs = 1704067200000L // 2024-01-01T00:00:00Z, fixed

  private val FillerVocab: Array[String] = Array(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "ember", "quartz", "willow", "harbor")

  /** Variant kinds mirror the reference's Scenario CSV fixtures
    * (FIXTURES.md §2): 0 exact, 1 case, 2 whitespace, 3 punctuation,
    * 4 special chars, 5 near (token edits), 6 unrelated (negative).
    */
  def transform(baseText: String, kind: Int, rng: DetRng): String = kind match {
    case 0 => baseText
    case 1 => // random per-word case flips -> identical after normalize
      baseText.split(' ').map { w =>
        if (rng.nextInt(2) == 0) w.toUpperCase(java.util.Locale.ROOT) else w
      }.mkString(" ")
    case 2 => // whitespace noise: extra spaces, newlines, NBSP, tabs
      baseText.split(' ').map { w =>
        rng.nextInt(6) match {
          case 0 => w + "  "
          case 1 => w + "\n"
          case 2 => w + "\u00A0"
          case 3 => w + "\t"
          case _ => w + " "
        }
      }.mkString("")
    case 3 => // punctuation + smart quotes + dashes -> stripped by normalize
      baseText.split(' ').map { w =>
        rng.nextInt(8) match {
          case 0 => w + ","
          case 1 => w + "."
          case 2 => "\u201C" + w + "\u201D"
          case 3 => w + ";"
          case 4 => w + "\u2014"
          case 5 => "\u2018" + w + "\u2019"
          case _ => w
        }
      }.mkString(" ")
    case 4 => // soft hyphens, page labels, dates, long ids, bullets
      val words = baseText.split(' ')
      val sb = new StringBuilder
      var i = 0
      while (i < words.length) {
        if (i % 17 == 5) sb.append("Page ").append(1 + rng.nextInt(40)).append(" of 40\n")
        if (i % 23 == 7) sb.append("\u2022 ")
        val w = words(i)
        if (w.length > 6 && rng.nextInt(4) == 0)
          sb.append(w.substring(0, 3)).append('\u00AD').append(w.substring(3))
        else sb.append(w)
        if (i % 29 == 11) sb.append(" 2024-0").append(1 + rng.nextInt(9)).append("-15 ")
        if (i % 31 == 13) sb.append(" ").append(100000 + rng.nextInt(899999)).append("77 ")
        sb.append(' ')
        i += 1
      }
      sb.toString
    case 5 => // token edits: replace ~2-10% of words -> NEAR duplicate
      val words = baseText.split(' ')
      val pct = 2 + rng.nextInt(9)
      words.map { w =>
        if (rng.nextInt(100) < pct) FillerVocab(rng.nextInt(FillerVocab.length)) else w
      }.mkString(" ")
    case _ => // heavy rewrite (~50%): must NOT be detected as duplicate
      val words = baseText.split(' ')
      words.map { w =>
        if (rng.nextInt(100) < 50) FillerVocab(rng.nextInt(FillerVocab.length)) else w
      }.mkString(" ")
  }

  /** Page markup with a deterministic outlink structure (a pure function
    * of `site`), so the link-graph operators (graph/LinkGraph) have a
    * non-trivial host graph to extract: two intra-site anchors (one under
    * a `www.` variant to exercise host canonicalization), a ring link to
    * site+1, a scatter link to site*7+3 mod 20, and a hub link every page
    * emits to site0 — the skew that makes PageRank non-uniform.
    */
  def htmlWrap(title: String, text: String, site: Int): Array[Byte] = {
    val nxt = (site + 1) % 20
    val hop = (site * 7 + 3) % 20
    val boiler = s"<nav>site $site navigation " +
      s"""<a href="https://site$site.example/">home</a> """ +
      s"""<a href="https://www.site$site.example/about">about</a> contact</nav>"""
    val footer = s"""<footer>(c) site $site <a href="https://site$nxt.example/doc/0">next</a> """ +
      s"""<a href="https://site$hop.example/">partner</a> """ +
      s"""<a href="https://site0.example/">network</a></footer>"""
    s"<html><head><title>$title</title></head><body>$boiler<main>$text</main>$footer</body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Derive a pages table from the driver's documents.parquet
    * (doc_id, text, lang, source, n_chars): each document becomes a base
    * page plus `variants` transformed copies. Deterministic in
    * (doc_id, variant). `variants = 0` gives the raw corpus.
    */
  def fromDocuments(spark: SparkSession, sfDir: String, variants: Int = 3): Dataset[Page] = {
    import spark.implicits._
    // The sandbox sf tables are single small parquet files = one input
    // split; fan the doc list out to the session's parallelism so the
    // per-doc CPU work (normalize/sign) scales with cores. On a real
    // cluster the input is already thousands of splits and this coalesces
    // to a no-op-sized shuffle of (id, text) rows.
    val par = math.max(spark.sparkContext.defaultParallelism * 2, 8)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("long"), $"text", $"lang", $"source")
      .as[(Long, String, String, String)]
      .repartition(par)
    val v = variants
    docs.flatMap { case (id, text, lang, source) =>
      val site = (id % 20).toInt
      val base = Page(
        url = s"https://site$site.example/doc/$id",
        warc_ts = new Timestamp(EpochMs + id * 60000L),
        html = htmlWrap(s"doc $id", text, site),
        text = text,
        lang = lang)
      val vars = (1 to v).map { k =>
        val rng = new DetRng(mix64(id * 31L + k))
        // cycle through variant kinds; kind 6 (negative) appears too
        val kind = (mix64(id * 7L + k) & 0x7FFFFFFF).toInt % 7
        val t = transform(text, kind, rng)
        Page(
          url = s"https://site$site.example/doc/$id/v$k",
          warc_ts = new Timestamp(EpochMs + id * 60000L + k * 1000L),
          html = htmlWrap(s"doc $id v$k", t, site),
          text = t,
          lang = lang)
      }
      base +: vars
    }
  }

  /** Pure-Scala synthetic corpus with planted families and a truth table.
    * Returns (pages, truth) where truth = (a, b, family, kind) for every
    * expected duplicate pair (EXACT after normalization, or NEAR).
    */
  def syntheticCorpus(spark: SparkSession, nFamilies: Int, membersPerFamily: Int,
                      seed: Long = 42L): (Dataset[Page], DataFrame) = {
    import spark.implicits._
    val pagesBuf = scala.collection.mutable.ArrayBuffer.empty[Page]
    val truthBuf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Int, String)]
    val rng = new DetRng(seed)
    var f = 0
    while (f < nFamilies) {
      val len = 100 + rng.nextInt(300)
      val base = (0 until len).map(_ => FillerVocab(rng.nextInt(FillerVocab.length))).mkString(" ")
      val urls = scala.collection.mutable.ArrayBuffer.empty[(String, String)] // (url, kindName)
      var m = 0
      while (m < membersPerFamily) {
        val kind = m % 7
        val t = if (m == 0) base else transform(base, kind, new DetRng(mix64(seed + f * 1000L + m)))
        val url = s"https://synth.example/f$f/m$m"
        pagesBuf += Page(url, new Timestamp(EpochMs + (f * 100L + m) * 1000L),
          htmlWrap(s"f$f m$m", t, f % 10), t, "en")
        val kindName = kind match {
          case 0 | 1 | 2 | 3 | 4 => if (m == 0) "BASE" else "EXACT"
          case 5 => "NEAR"
          case _ => "NONE"
        }
        urls += ((url, kindName))
        m += 1
      }
      // truth pairs: every member with kind != NONE duplicates the base
      val dupMembers = urls.filter { case (_, k) => k != "NONE" }
      for (i <- dupMembers.indices; j <- (i + 1) until dupMembers.size) {
        val kind = if (dupMembers(i)._2 != "NEAR" && dupMembers(j)._2 != "NEAR") "EXACT" else "NEAR"
        truthBuf += ((dupMembers(i)._1, dupMembers(j)._1, f, kind))
      }
      f += 1
    }
    val pages = spark.createDataset(pagesBuf.toSeq)
    val truth = truthBuf.toSeq.toDF("a", "b", "family", "kind")
    (pages, truth)
  }
}
