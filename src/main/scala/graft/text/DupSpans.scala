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

  /** The APPLY half of ExactSubstr dedup (Lee et al. §3: "when the same
    * substring appears multiple times we keep one occurrence and remove
    * the rest"): cut every duplicated window run from every occurrence
    * EXCEPT the globally first one (min (id, pos) per window key — a
    * deterministic keep-one that needs no coordination beyond the same
    * key groupBy the detector already does). Returns
    * (idCol, n_tokens, n_removed, clean_text) with clean_text = the
    * surviving tokens joined by single spaces.
    *
    * Scale shape: the keep-one rule rides the existing window-key
    * groupBy as a partial-aggregated min(struct(id, pos)) — map-side
    * combinable, no per-key sort; removable windows attach by one
    * equi-join on the key (multiplicity 1 — no blowup on boilerplate
    * mega-keys); span merge is the same per-doc gaps-and-islands pass;
    * and the text splice is a codegen'd higher-order projection.
    */
  def removeSpans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = windowRows(df, idCol, textCol, k)
    val keyAgg = w.groupBy(col("g")).agg(
      count(lit(1)).as("occ"),
      min(struct(col(idCol).as("fid"), col("pos").as("fpos"))).as("first"))
      .filter(col("occ") >= 2)
      .select(col("g"), col("first.fid").as("fid"), col("first.fpos").as("fpos"))
    val removable = w.join(keyAgg, Seq("g"))
      .filter(!(col(idCol) === col("fid") && col("pos") === col("fpos")))
      .select(col(idCol), col("pos"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val docSpans = removable
      .withColumn("island", col("pos") - row_number().over(byDoc))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(k - 1)).as("e"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    df.select(col(idCol), Decontaminate.tokensCol(col(textCol)).as("tk"))
      .join(docSpans, Seq(idCol), "left")
      .withColumn("spans",
        coalesce(col("spans"), expr("CAST(array() AS array<struct<s:int,e:int>>)")))
      .withColumn("kept", expr(
        "filter(transform(sequence(1, size(tk)), i -> " +
          "IF(exists(spans, sp -> i >= sp.s AND i <= sp.e), CAST(NULL AS STRING), " +
          "element_at(tk, CAST(i AS INT)))), x -> x IS NOT NULL)"))
      .select(col(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        (size(col("tk")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }
}
