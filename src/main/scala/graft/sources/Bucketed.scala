package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) table layout — the STORAGE-side shuffle
  * elimination for repeated joins and aggregations on a stable key. A
  * table written with `bucketBy(n, key)` records its hash-partitioning in
  * the catalog; every later equi-join or groupBy on that key between
  * co-bucketed tables satisfies the required distribution at SCAN time,
  * so the plan carries ZERO Exchange (BucketedJoinSpec asserts this
  * against an unbucketed control plan that does shuffle).
  *
  * At 100 TB this is the difference between re-shuffling the corpus on
  * every doc_id join (signatures ⋈ verdicts ⋈ clusters ⋈ stats — the
  * dedup pipeline joins on the doc key constantly) and shuffling it once
  * at write time. The same contract Iceberg expresses as a bucket
  * partition transform; here it is Spark's native catalog bucketing, and
  * the bucket count is the knob that must track corpus bytes / target
  * task size at deployment.
  *
  * Tables live in a dedicated database with an explicit LOCATION so the
  * warehouse never pollutes the working directory; the in-memory catalog
  * is session-scoped (a fresh session re-registers over the same files),
  * which is exactly the seam a persistent metastore/catalog fills on a
  * real cluster.
  */
object Bucketed {

  /** Idempotently create the database holding bucketed tables. */
  def ensureDb(spark: SparkSession, db: String, location: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$location'")
    ()
  }

  /** Write `df` as a managed parquet table bucketed AND sorted by `key` —
    * sortBy keeps bucket files internally ordered so co-bucketed
    * sort-merge joins skip the per-task sort when one file per bucket.
    *
    * The in-memory catalog is session-scoped but the table FILES are not:
    * a fresh session that re-creates the table would hit Spark's
    * non-empty-location CTAS guard on the previous session's files. So
    * the write first drops any catalog entry AND clears the stale table
    * directory — exactly the bookkeeping a persistent metastore does for
    * real; idempotent within and across sessions.
    */
  def writeTable(df: DataFrame, fqTable: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $fqTable")
    fqTable.split("\\.") match {
      case Array(db, tbl) =>
        val loc = new java.net.URI(spark.catalog.getDatabase(db).locationUri)
        val dir = new java.io.File(new java.io.File(loc.getPath), tbl)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        if (dir.exists()) rm(dir)
      case _ => // default database: DROP TABLE alone is sufficient there
    }
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(fqTable)
    ()
  }
}
