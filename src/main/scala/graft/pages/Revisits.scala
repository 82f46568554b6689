package graft.pages

import graft.sample.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-snapshot revisit handling — the URL-axis dedup that runs BEFORE
  * any content pass on a Common-Crawl-style corpus: the same URL is
  * refetched across snapshots, and most refetches are byte-identical.
  * Collapsing them per-URL (keep the newest fetch) removes the largest
  * dup class with one hash-partition shuffle on `url` — no signatures,
  * no pair joins — so the MinHash/LSH stages downstream only ever see
  * one version per URL.
  *
  * Reference behavior: the reference ingests each file once and keys
  * storage by path+hash (/root/reference/src/storage/sqlite_store.py —
  * re-ingesting an updated file replaces the row); this module is the
  * crawl-shaped generalization over (url, warc_ts).
  *
  * All derivations are engine-independent (md5-prefix uniform, interval
  * arithmetic, md5 version tags), so every operator here is fully
  * recomputable by the DuckDB oracle.
  */
object Revisits {

  /** Deterministic refetch derivation for tests/bench: every page whose
    * md5-uniform(url) < `refetchRate` gains a second fetch one day later;
    * the half with u < refetchRate/2 changed content (text gains a
    * " revision 2" suffix and the html is re-wrapped around the new
    * text), the rest are content-identical refetches (the common case in
    * real crawls). Pure per-row derivation — map-only, no shuffle, and
    * bit-identical in DuckDB, which is what lets the revisit queries be
    * oracled end-to-end with zero identity reads.
    */
  def withRefetches(pages: DataFrame, refetchRate: Double = 0.3): DataFrame = {
    val u = Sampling.hashU(col("url"))
    val changed = u < lit(refetchRate / 2)
    val newText = when(changed, concat(col("text"), lit(" revision 2")))
      .otherwise(col("text"))
    val refetch = pages.filter(u < lit(refetchRate)).select(
      col("url"),
      (col("warc_ts") + expr("INTERVAL 1 DAY")).as("warc_ts"),
      when(changed,
        concat(lit("<html><body>"), newText, lit("</body></html>"))
          .cast("binary"))
        .otherwise(col("html")).as("html"),
      newText.as("text"),
      col("lang"))
    pages.unionByName(refetch)
  }

  /** Keep the newest fetch per exact URL: row_number over
    * (url / warc_ts desc, md5(text) desc) == 1. The md5 tie-break makes
    * the survivor deterministic even if two fetches share a timestamp.
    * One hash-partition shuffle on `url` — per-group state is a single
    * row_number counter, no global order, so the operator scales as a
    * plain aggregation: hot URLs are impossible (a URL's fetch count is
    * bounded by the number of crawl snapshots, ~100, not by corpus size).
    */
  def keepLatestFetch(pages: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url"))
      .orderBy(col("warc_ts").desc, md5(col("text").cast("binary")).desc)
    pages.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Per-URL revision statistics — the crawl-health signal deciding which
    * URLs need content dedup at all: (url, n_fetches, n_versions,
    * first_ts_s, last_ts_s, changed). `n_versions` counts distinct
    * md5(text) version tags; `changed` marks URLs whose content actually
    * drifted between fetches (refetch dups have n_fetches > n_versions).
    * One map-side-combinable groupBy on url; timestamps surface as epoch
    * seconds (BIGINT) so the result is engine-portable.
    */
  def urlRevisionStats(pages: DataFrame): DataFrame =
    pages.groupBy("url").agg(
      count(lit(1)).as("n_fetches"),
      countDistinct(md5(col("text").cast("binary"))).as("n_versions"),
      min(col("warc_ts").cast("long")).as("first_ts_s"),
      max(col("warc_ts").cast("long")).as("last_ts_s"))
      .withColumn("changed", col("n_versions") > 1)
}
