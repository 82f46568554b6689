package graft.sources

import graft.model.Schemas.Page
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Input sources mirroring the reference's ingest surface (SURVEY.md §2.1):
  *
  *  - S5 CSV import (`import-csv`, cli_nd.py:899-942): a `text` column plus
  *    optional id; seeded sampling.
  *  - S6 JSON source (cli_nd.py:150-189): array of {doc_id, text} objects.
  *  - Pages table reader: catalog table when a name is given (Iceberg-style
  *    deployment), Parquet path otherwise (sandbox has no Iceberg jar —
  *    SURVEY.md scope notes).
  *  - A7 ingest-time exact dedup: drop rows whose content hash is already
  *    present in a seen-hashes table (anti-join replaces the reference's
  *    row-at-a-time probe, qdrant_service.py:421-452).
  */
object Sources {

  /** Read the pages table. `table` may be a catalog name (contains no '/')
    * or a filesystem path to Parquet.
    */
  def pages(spark: SparkSession, table: String): Dataset[Page] = {
    import spark.implicits._
    val df = if (table.contains("/")) spark.read.parquet(table) else spark.read.table(table)
    df.select($"url", $"warc_ts", $"html", $"text", $"lang").as[Page]
  }

  /** S5 — CSV with a `text` column; doc ids default to the row's text
    * sha1 like the reference's import (app.py:1755-1807 uses sha1 row ids).
    */
  def csvDocs(spark: SparkSession, path: String, sampleN: Option[Int] = None,
              seed: Long = 13L): DataFrame = {
    val raw = spark.read.option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(path)
    val withId =
      if (raw.columns.contains("doc_id"))
        raw.withColumn("doc_id", coalesce(col("doc_id"), sha1(col("text"))))
      else raw.withColumn("doc_id", sha1(col("text")))
    val df = withId.select(col("doc_id"), col("text"))
    sampleN match {
      case Some(n) => df.orderBy(xxhash64(col("doc_id"), lit(seed))).limit(n)
      case None => df
    }
  }

  /** S6 — JSON lines / array of {doc_id, text}. */
  def jsonDocs(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(col("doc_id").cast("string"), col("text"))

  /** S10 — keyed upsert (sqlite_store.py:156-182 INSERT OR REPLACE done
    * set-wise): rows from `updates` win per key, everything else from
    * `existing` survives. INSERT OR REPLACE keeps exactly ONE row per key,
    * so duplicate keys within `updates` are resolved first — the
    * lexicographically-greatest row (by the non-key columns) wins, a
    * deterministic set-wise stand-in for sqlite's last-write-wins.
    */
  def upsertByKey(existing: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val others = updates.columns.filterNot(_ == key)
    val onePerKey =
      if (others.isEmpty) updates.distinct()
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(key)).orderBy(others.map(c => col(c).desc): _*)
        updates.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    existing.join(onePerKey.select(col(key)), Seq(key), "left_anti").unionByName(onePerKey)
  }

  /** A7 — ingest-time exact dedup: keep the first row per content hash
    * within the batch, then anti-join against the seen-hashes table.
    */
  def dedupIngest(batch: DataFrame, textCol: String, seenHashes: DataFrame): DataFrame = {
    val hashed = batch.withColumn("content_hash", sha2(lower(trim(col(textCol))), 256))
    val firstPerHash = hashed
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))
          .orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")
    firstPerHash.join(seenHashes.select(col("content_hash")), Seq("content_hash"), "left_anti")
  }
}
