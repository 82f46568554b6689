package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Char-trigram familiarity scoring — a CCNet-style language-model
  * quality proxy with EXACT integer semantics: documents whose trigram
  * stream is made of corpus-frequent trigrams score high (fluent prose),
  * gibberish/lorem/encoding-damage scores low. Where CCNet uses a KenLM
  * perplexity (transcendental math, not portable across engines
  * bit-for-bit), this uses mean document frequency of the trigram
  * occurrences in parts-per-million with ONE integer division at the end
  * — the whole chain (normalize, extract, count, score) is recomputable
  * by the DuckDB oracle with zero float drift, the same trick as the
  * integer PageRank.
  *
  * Normalization maps text onto the 27-symbol alphabet [a-z ] (lowercase,
  * every non-letter run collapsed to one space), so:
  *  - the trigram space is BOUNDED at 27^3 = 19,683 — the fitted model is
  *    always a broadcast table no matter the corpus size (the 100 TB
  *    scale shape: fit = one map-side-combinable groupBy bounded by the
  *    alphabet; apply = map-only explode + BroadcastHashJoin + one
  *    partial-agg shuffle on doc_id);
  *  - extraction is pure ASCII, so Spark's and DuckDB's substring
  *    semantics coincide trivially.
  */
object Familiarity {

  /** Lowercase, collapse non-letter runs to single spaces, trim. */
  def normalized(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(lower(c), "[^a-z]+", " "))

  /** (trigram, df) — number of documents whose normalized text contains
    * the trigram at least once. Bounded by 27^3 rows.
    */
  def trigramDf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), normalized(col(textCol)).as("ns"))
      .withColumn("tgs", expr(
        "CASE WHEN length(ns) >= 3 THEN " +
          "array_distinct(transform(sequence(1, length(ns) - 2), i -> substring(ns, i, 3))) " +
          "ELSE array() END"))
      .select(col("id"), explode(col("tgs")).as("trigram"))
      .groupBy("trigram").agg(count(lit(1)).as("df"))

  /** Per-document familiarity over trigram OCCURRENCES (not distinct):
    * (id, n_trigrams, sum_df, score_ppm) with
    * score_ppm = (1e6 * sum_df) div (n_trigrams * total_docs) — integer
    * floor division, exact in any engine. Documents with no trigram
    * (normalized text shorter than 3) are dropped: they have no stream to
    * score and a curation gate treats them as length-rejected upstream.
    * `model` is (trigram, df) from trigramDf (same corpus, or a reference
    * corpus for cross-corpus scoring); `totalDocs` is the model corpus
    * size — the df denominator.
    */
  def score(docs: DataFrame, model: DataFrame, totalDocs: Long,
            idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), normalized(col(textCol)).as("ns"))
      .withColumn("tgs", expr(
        "CASE WHEN length(ns) >= 3 THEN " +
          "transform(sequence(1, length(ns) - 2), i -> substring(ns, i, 3)) " +
          "ELSE array() END"))
      .select(col("id"), explode(col("tgs")).as("trigram"))
      .join(broadcast(model.select(col("trigram"), col("df"))), Seq("trigram"), "left")
      .groupBy("id").agg(
        count(lit(1)).as("n_trigrams"),
        sum(coalesce(col("df"), lit(0L))).as("sum_df"))
      .withColumn("score_ppm",
        expr(s"(1000000L * sum_df) div (n_trigrams * ${totalDocs}L)"))
}
