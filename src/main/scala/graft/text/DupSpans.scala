package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level EXACT-substring duplicate spans (Lee et al. 2021
  * arXiv:2107.06499, "ExactSubstr"): every maximal token span whose text
  * occurs at least twice in the corpus (cross-doc or within-doc — the
  * paper's view of the corpus as one concatenation), reported per doc as
  * (span_start, span_end, span_len) in 1-based token positions. This is
  * the EXHAUSTIVE complement to the sampled winnowing fingerprints
  * (sig/Winnow): winnowing answers "which doc pairs share material",
  * ExactSubstr answers "exactly which tokens are duplicated" — the
  * operator training pipelines use to CUT the duplicated text itself.
  *
  * Scale shape: Lee et al. build one giant suffix array — a single-node
  * design. The distributed formulation is the windowed MapReduce one:
  * every k-token window becomes a row (token-scale data, the same class
  * as the shingle pipeline), duplicated window KEYS are found by one
  * map-side-combinable groupBy (count >= 2 — no pair enumeration, so
  * boilerplate mega-keys cost one counter, not a quadratic bucket), docs
  * re-acquire their duplicated windows by LEFT SEMI join (multiplicity 1,
  * no blowup on skewed keys), and runs of consecutive duplicated windows
  * merge to maximal spans with one per-doc gaps-and-islands window pass
  * (pos - row_number). Three shuffles total, each AQE-planned. Production
  * carries xxh64(window) longs; the window STRING is carried here so the
  * DuckDB oracle recomputes the identical chain.
  */
object DupSpans {

  /** (idCol, pos, g): one row per k-token window, pos 1-based. */
  def windowRows(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
      posexplode(Decontaminate.ngramsCol(Decontaminate.tokensCol(col(textCol)), k)))
      .select(col(idCol), (col("pos") + 1).as("pos"), col("col").as("g"))

  /** Maximal duplicated spans per doc: (idCol, span_start, span_end,
    * span_len), token positions 1-based inclusive, span_end covers the
    * last token of the last duplicated window.
    */
  def spans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = windowRows(df, idCol, textCol, k)
    val dupKeys = w.groupBy(col("g")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select(col("g"))
    val dup = w.join(dupKeys, Seq("g"), "left_semi")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    dup
      .withColumn("island", col("pos") - row_number().over(byDoc))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(k - 1)).cast("long").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_len"))
  }
}
