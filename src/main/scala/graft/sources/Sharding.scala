package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Size-balanced shard assignment — the output stage of a curation
  * pipeline: deal the kept corpus into `nShards` shards whose total
  * weight (chars, tokens, bytes) is balanced, so downstream training
  * readers get equal-work splits regardless of the document size
  * distribution (web corpora are heavy-tailed; naive hash sharding can
  * leave one shard several× the median).
  *
  * Algorithm: striped LPT-lite — a deterministic global rank by
  * (weight DESC, key ASC), then shard = (rank-1) mod nShards. Dealing
  * size-descending rounds bounds the spread: max(shard total) −
  * min(shard total) ≤ max(single weight) (each round of S consecutive
  * ranks has internally non-increasing weights, and round sums telescope).
  *
  * Scale shape: NO single-partition window. The global rank is the
  * two-pass range-partition prefix scan (the Metrics.scoreCumulative
  * idiom): repartitionByRange + sortWithinPartitions gives a total order
  * across partitions, a first pass collects one (partition, count) row
  * per partition (bounded by partition count, not rows), and the second
  * pass adds the broadcast offsets to a per-partition counter. The only
  * driver-side state is one long per partition.
  */
object Sharding {

  /** Returns (key, weight, rank, shard): `rank` is the 1-based position
    * in the (weight DESC, key ASC-as-string) total order, `shard` in
    * [0, nShards). Deterministic under any input partitioning — ties are
    * fully broken by the unique key.
    */
  def assignShards(df: DataFrame, keyCol: String, weightCol: String,
                   nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = df.sparkSession
    import spark.implicits._
    val kw = df.select(col(keyCol).cast("string").as("key"),
        col(weightCol).cast("long").as("weight"))
      .as[(String, Long)]
    val nParts = math.max(2, spark.sparkContext.defaultParallelism)
    // localCheckpoint pins the sampled range boundaries so the counting
    // pass and the ranking pass see the identical partitioning
    val parted = kw.repartitionByRange(nParts, $"weight".desc, $"key".asc)
      .sortWithinPartitions($"weight".desc, $"key".asc)
      .localCheckpoint()
    val perPart = parted.mapPartitions { it =>
      Iterator((TaskContext.getPartitionId(), it.size.toLong))
    }.collect().sortBy(_._1)
    val offsets = scala.collection.mutable.HashMap.empty[Int, Long]
    var acc = 0L
    perPart.foreach { case (pid, n) => offsets(pid) = acc; acc += n }
    val bc = spark.sparkContext.broadcast(offsets.toMap)
    val s = nShards
    parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var rank = bc.value.getOrElse(pid, 0L)
      it.map { case (k, w) =>
        rank += 1
        (k, w, rank, ((rank - 1) % s).toInt)
      }
    }.toDF("key", "weight", "rank", "shard")
  }

  /** Per-shard balance report: (shard, n_docs, total_weight). */
  def shardStats(assigned: DataFrame): DataFrame =
    assigned.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum("weight").as("total_weight"))
}
