package graft.lsh

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE mega-bucket guard — one implementation, one logged-drop protocol,
  * shared by every LSH path (dedup candidateStage, incremental ingest's
  * combined-size guard, TokenLsh, ANN hyperplane buckets).
  *
  * A degenerate bucket — corpus-wide boilerplate token sets, all-equal
  * signatures, all-zero vectors — turns a bucket self-join quadratic, the
  * single worst skew source at web scale. Buckets above `maxBucketSize`
  * are DROPPED (never partially sampled: partial buckets would make the
  * candidate set partitioning-dependent), the drop count is logged to
  * stderr and published under the local property
  * `graft.<tag>.droppedBuckets`, and singleton buckets are pruned in the
  * same pass (no pair can come out of them).
  *
  * Mirrors the reference's per-doc candidate caps
  * (near_duplicate.py:36-37,408-417) at the bucket level.
  */
object BucketGuard {

  /** @param ok      surviving (band, bucket) keys — join back onto the
    *                caller's row relation(s)
    * @param dropped number of buckets dropped for exceeding the cap
    */
  final case class Guarded(ok: DataFrame, dropped: Long)

  /** @param rows DataFrame with at least (band, bucket) columns — one row
    *             per bucket MEMBER (union multiple relations first for a
    *             combined-size guard).
    * @param tag  short path id for the log line / local property
    *             (`pipeline`, `inc`, `tokenLsh`, `ann`).
    */
  def okBuckets(spark: SparkSession, rows: DataFrame, maxBucketSize: Long,
                tag: String): Guarded = {
    import spark.implicits._
    // localCheckpoint, not persist: it materializes the aggregation once
    // for the count + filter consumers AND its blocks are reclaimed by the
    // ContextCleaner when the plan goes out of scope — persist would leak
    // one cached relation per guarded LSH pass for the session lifetime.
    // The dropped-bucket count is accumulated by the SAME tasks that
    // materialize the checkpoint (was a separate filter+count job over the
    // checkpointed sizes — one job per guarded LSH pass saved). The rows
    // are deterministic aggregation output, so a rare task retry
    // re-observes identical rows; the count feeds a log line and the
    // drop-metric property, and the planted-bucket specs see the exact
    // value on the happy path.
    val acc = spark.sparkContext.longAccumulator(s"graft.$tag.droppedBucketsAcc")
    val sized = rows.groupBy($"band", $"bucket").count()
    // Row-encoded pass-through (callers use int, long AND string bucket
    // types — winnow fingerprints are strings): schema and values are
    // preserved exactly, only the side-effect count is added.
    val sizes = sized.mapPartitions { it =>
        it.map { r => if (r.getLong(2) > maxBucketSize) acc.add(1L); r }
      }(org.apache.spark.sql.Encoders.row(sized.schema))
      .localCheckpoint()
    val dropped = acc.value
    if (dropped > 0)
      System.err.println(
        s"[graft.$tag] dropped $dropped mega-buckets (> $maxBucketSize members)")
    spark.sparkContext.setLocalProperty(s"graft.$tag.droppedBuckets", dropped.toString)
    Guarded(sizes.filter($"count" >= 2 && $"count" <= maxBucketSize)
      .select($"band", $"bucket"), dropped)
  }
}
