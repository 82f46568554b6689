package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gopher-style within-document repetition signals (Rae et al. 2021,
  * arXiv:2112.11446 Table A1 — public): the quality axis that catches
  * boilerplate-stuffed and degenerate pages that cross-page dedup cannot
  * see (repetition lives INSIDE one page). The reference has no
  * within-doc repetition filter (its quality gate is char-class ratios,
  * `q_quality_score`) — this is a bonus-surface curation operator.
  *
  * Definitions (documented precisely so the DuckDB oracle is a true
  * recomputation, not a guess):
  * - dup_line_frac       = (occurrences of lines whose in-doc count > 1,
  *                          ALL occurrences counted) / total lines
  * - dup_line_char_frac  = same numerator/denominator weighted by
  *                          line length in chars (newlines excluded)
  * - topN_gram_char_frac = count(top gram) * chars(top gram) /
  *                          chars(single-space-joined lowercase tokens);
  *                          top gram = max count, ties -> lexicographic
  *                          min (a total order both engines share)
  * All counts are exact integers; every fraction is ONE double division
  * of those integers, so the engines agree bit-for-bit.
  *
  * Scale shape: a pure per-row typed map — no shuffle, no explode, no
  * per-doc groupBy (the in-doc hash maps are bounded by doc size), and
  * no Column-HOF chain (the Winnow lesson: Catalyst re-evaluates inlined
  * HOF transforms per window — 493 s vs 2 s at sf0.1).
  */
object Repetition {

  /** (n_lines, dup_line_frac, dup_line_char_frac, top2, top3) */
  def signals(text: String): (Long, Double, Double, Double, Double) = {
    val lines = text.split("\n", -1)
    val lineCounts = scala.collection.mutable.HashMap.empty[String, Int]
    lines.foreach(l => lineCounts.update(l, lineCounts.getOrElse(l, 0) + 1))
    val nLines = lines.length.toLong
    var dupLines = 0L; var dupChars = 0L; var totChars = 0L
    lineCounts.foreach { case (l, c) =>
      totChars += l.length.toLong * c
      if (c > 1) { dupLines += c; dupChars += l.length.toLong * c }
    }
    val trimmed = text.trim.toLowerCase
    val toks = if (trimmed.isEmpty) Array.empty[String] else trimmed.split("\\s+")
    val wordChars = toks.foldLeft(0L)(_ + _.length) + math.max(0, toks.length - 1).toLong

    def topFrac(n: Int): Double =
      if (toks.length < n || wordChars == 0L) 0.0
      else {
        val cnt = scala.collection.mutable.HashMap.empty[String, Int]
        var i = 0
        while (i + n <= toks.length) {
          val g = toks.slice(i, i + n).mkString(" ")
          cnt.update(g, cnt.getOrElse(g, 0) + 1)
          i += 1
        }
        var bestG: String = null; var bestC = -1
        cnt.foreach { case (g, c) =>
          if (c > bestC || (c == bestC && g < bestG)) { bestG = g; bestC = c }
        }
        (bestC.toLong * bestG.length.toLong).toDouble / wordChars.toDouble
      }

    (nLines,
      if (nLines == 0L) 0.0 else dupLines.toDouble / nLines.toDouble,
      if (totChars == 0L) 0.0 else dupChars.toDouble / totChars.toDouble,
      topFrac(2), topFrac(3))
  }

  def signalsDf(spark: SparkSession, docs: DataFrame,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, t) =>
        val s = signals(if (t == null) "" else t)
        (id, s._1, s._2, s._3, s._4, s._5)
      }
      .toDF(idCol, "n_lines", "dup_line_frac", "dup_line_char_frac",
        "top2gram_char_frac", "top3gram_char_frac")
  }

  /** Gopher Table A1 repetition thresholds (public defaults). */
  val DupLineFracMax = 0.30
  val DupLineCharFracMax = 0.20
  val Top2GramCharFracMax = 0.20
  val Top3GramCharFracMax = 0.18

  /** The Gopher repetition GATE over [[signalsDf]] output: one boolean per
    * published threshold plus the conjunction. Every comparison is a
    * bit-identical double against a shared literal, so the gate stays
    * cross-engine deterministic wherever the signals are. Per-row
    * projection — adds nothing to the plan beyond the signal map.
    */
  def gopherGate(signals: DataFrame): DataFrame =
    signals.select(col("doc_id"),
      (col("dup_line_frac") <= DupLineFracMax).as("ok_dup_lines"),
      (col("dup_line_char_frac") <= DupLineCharFracMax).as("ok_dup_chars"),
      (col("top2gram_char_frac") <= Top2GramCharFracMax).as("ok_top2gram"),
      (col("top3gram_char_frac") <= Top3GramCharFracMax).as("ok_top3gram"),
      (col("dup_line_frac") <= DupLineFracMax &&
        col("dup_line_char_frac") <= DupLineCharFracMax &&
        col("top2gram_char_frac") <= Top2GramCharFracMax &&
        col("top3gram_char_frac") <= Top3GramCharFracMax).as("pass"))
}
