package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the last step between a curated corpus and a
  * training run: lay the kept documents out in deterministic id order and
  * cut the token stream into fixed-budget training sequences (GPT-style
  * packing: documents straddle sequence boundaries rather than padding;
  * the trainer masks cross-doc attention). Each doc gets
  * (bin_id, bin_offset): the sequence index and the token offset within
  * it where the doc starts — exactly what a data loader needs to slice
  * the stream. The reference stops at dedup; packing is one of the
  * training-pipeline operators the graft adds.
  *
  * Scale shape: a global running token offset is a prefix sum, and the
  * naive formulation — `sum() OVER (ORDER BY id)` with no partition key —
  * is a single-task global Window that serializes 100 TB through one
  * executor. This is instead the two-pass distributed scan already used
  * by Metrics.scoreCumulative: range-repartition by id + per-partition
  * totals (one tiny collect: one row per partition) + broadcast cumulative
  * offsets + one mapPartitions that carries the running offset. The plan
  * contains NO Window operator (PackingSpec asserts it). localCheckpoint
  * pins the sampled range boundaries so both passes see the identical
  * partitioning (same trade as scoreCumulative; on a multi-executor
  * cluster an executor loss forces recompute from the checkpoint's
  * surviving blocks — acceptable for a derived, cheap-to-rebuild stage).
  */
object Packing {

  /** (idCol, n_tokens, bin_id, bin_offset) — one row per doc, packed in
    * ascending idCol order; a doc whose first token lands at global
    * offset S gets bin_id = S / budget and bin_offset = S % budget.
    */
  def assign(df: DataFrame, idCol: String, nTokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val slim = df
      .select(col(idCol).cast("long").as("id"), col(nTokCol).cast("long").as("n"))
      .as[(Long, Long)]
    val nParts = math.max(2, spark.sparkContext.defaultParallelism)
    val parted = slim.repartitionByRange(nParts, $"id")
      .sortWithinPartitions($"id").localCheckpoint()
    val perPart = parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var t = 0L
      it.foreach(t += _._2)
      Iterator((pid, t))
    }.collect().sortBy(_._1)
    var acc = 0L
    val offsets = perPart.map { case (pid, t) =>
      val o = (pid, acc); acc += t; o
    }.toMap
    val bc = spark.sparkContext.broadcast(offsets)
    parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var s = bc.value.getOrElse(pid, 0L)
      it.map { case (id, n) =>
        val r = (id, n, s / budget, s % budget)
        s += n
        r
      }
    }.toDF(idCol, "n_tokens", "bin_id", "bin_offset")
  }
}
