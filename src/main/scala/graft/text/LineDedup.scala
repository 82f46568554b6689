package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level corpus deduplication — the C4/RefinedWeb curation operator:
  * drop every LINE that appears verbatim in at least `minDf` documents
  * (site navigation, footers, legal blurbs, cookie banners), emitting the
  * REWRITTEN text. This is a different deliverable from the pipeline's
  * boilerplate shingle suppression (sig/Boilerplate): suppression cleans
  * the dedup SIGNATURES so template text stops generating junk candidate
  * pairs; line dedup cleans the CORPUS itself — the text a training run
  * actually consumes.
  *
  * Semantics (all mirrored by the driver oracle):
  *  - a document's lines are `split(text, "\n")`, positions preserved;
  *  - df counts DOCUMENTS containing the line (per-doc distinct), not
  *    occurrences, so a line repeated inside one page cannot self-promote
  *    to hot;
  *  - a hot line (df >= minDf) is dropped at EVERY occurrence; remaining
  *    lines are rejoined with "\n" in original order. Empty segments are
  *    lines like any other (a hot empty line is dropped — C4 drops
  *    boilerplate segments outright).
  *
  * Scale shape: df is one groupBy with map-side partial aggregation over
  * per-doc-distinct lines; the hot set is bounded by total-lines / minDf
  * and in practice tiny (template lines by definition repeat across a
  * constant fraction of pages), so AQE turns the anti-join into a
  * broadcast; the rebuild is a per-doc groupBy whose width is one page.
  * At 10^12 docs run the df pass on a deterministic url-hash sample
  * exactly as Boilerplate.hotShingles does (same estimator argument).
  */
object LineDedup {

  /** Line document frequency: (line, df) over per-doc-distinct lines. */
  def lineDf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(array_distinct(split(col(textCol), "\n"))).as("line"))
      .groupBy("line").agg(count(lit(1)).as("df"))

  /** Lines with df >= minDf — the hot (boilerplate) set. */
  def hotLines(docs: DataFrame, textCol: String, minDf: Long): DataFrame =
    lineDf(docs, textCol).filter(col("df") >= minDf).select(col("line"))

  /** The rewritten corpus: (idCol, clean_text, n_lines, n_dropped).
    * Documents whose every line is hot come back with clean_text = "".
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 minDf: Long): DataFrame = {
    val hot = hotLines(docs, textCol, minDf)
    val x = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val agg = x.join(hot, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            e => e.getField("line")),
          "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
