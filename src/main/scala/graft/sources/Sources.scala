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
  def dedupIngest(batch: DataFrame, textCol: String, seenHashes: DataFrame): DataFrame =
    keepFirstPerHash(batch, textCol)
      .join(seenHashes.select(col("content_hash")), Seq("content_hash"), "left_anti")

  private def keepFirstPerHash(batch: DataFrame, textCol: String): DataFrame =
    batch.withColumn("content_hash", sha2(lower(trim(col(textCol))), 256))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))
          .orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")

  /** A7 at continuous-crawl scale: IDENTICAL output to dedupIngest, a
    * different physical path. A Bloom filter built over the seen hashes is
    * broadcast and splits the batch map-side:
    *
    *   - `mightContain == false` rows are DEFINITELY new (a Bloom has no
    *     false negatives) — they bypass the anti-join entirely, never
    *     shuffling against the seen table;
    *   - the "maybe seen" residue (true dups + ~fpp of the batch, the
    *     false positives) is the only part that runs the exact anti-join.
    *
    * At crawl scale the anti-join's left side shrinks from |batch| to
    * |dups| + fpp·|batch| — the standard sketch-prefilter shape when the
    * seen-hash table is join-sized but its MEMBERSHIP fits a broadcast
    * (1e9 hashes at fpp 0.01 ≈ 1.2 GB of Bloom bits vs ~64 GB of sha256
    * strings; beyond broadcast reach, partition the Bloom by hash prefix).
    * The probe is a Row-lambda filter — no builtin expression probes a
    * sketch, and the surrounding scan/window/join all stay codegen'd.
    *
    * Correctness does NOT depend on the Bloom: false positives are
    * removed by the confirm anti-join, false negatives cannot occur, so
    * the result is exact for any fpp — SourcesSpec asserts equality with
    * dedupIngest under fpp 0.5.
    */
  def bloomDedupIngest(spark: SparkSession, batch: DataFrame, textCol: String,
                       seenHashes: DataFrame, expectedItems: Long = -1L,
                       fpp: Double = 0.01): DataFrame = {
    val seen = seenHashes.select(col("content_hash"))
    val n = if (expectedItems > 0) expectedItems else math.max(seen.count(), 1L)
    val bf = seen.stat.bloomFilter("content_hash", n, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val firstPerHash = keepFirstPerHash(batch, textCol)
    val definitelyNew = firstPerHash.filter(
      (r: org.apache.spark.sql.Row) =>
        !bc.value.mightContainString(r.getAs[String]("content_hash")))
    val maybeSeen = firstPerHash.filter(
      (r: org.apache.spark.sql.Row) =>
        bc.value.mightContainString(r.getAs[String]("content_hash")))
    definitelyNew.unionByName(maybeSeen.join(seen, Seq("content_hash"), "left_anti"))
  }
}
