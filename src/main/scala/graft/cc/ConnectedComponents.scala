package graft.cc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative connected components over DataFrames (no GraphFrames jar in the
  * sandbox; the north rule asks for "union-find over DataFrames").
  *
  * Algorithm: min-label propagation with pointer jumping. Each vertex keeps
  * a `comp` label (initially itself); every round it takes the min of its
  * own label, its neighbors' labels, and its label's label (path halving).
  * Converges in O(log n) rounds; duplicate clusters are near-cliques, so in
  * practice 2-3 rounds. Each round ends in `localCheckpoint` to truncate
  * lineage (SURVEY.md §4 "must add explicitly").
  *
  * Replaces the reference's driver-side DSU
  * (/root/reference/src/pipelines/near_duplicate.py:335-371) — a Python
  * dict union-find cannot hold 10^12 vertices; this shuffles on the edge
  * key instead.
  */
object ConnectedComponents {

  /** @param edges DataFrame with string columns (a, b), undirected.
    * @param reliable use durable checkpoint() (requires a configured
    *        checkpoint dir) instead of localCheckpoint for the per-round
    *        lineage truncation — executor-loss-safe on real clusters.
    * @return DataFrame (url, comp) where comp = lexicographic min url of
    *         the component. Covers only vertices incident to an edge.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 25,
          reliable: Boolean = false): DataFrame = {
    import spark.implicits._
    if (reliable) require(spark.sparkContext.getCheckpointDir.isDefined,
      "reliable=true requires spark.sparkContext.setCheckpointDir(<durable dir>)")
    def ck(df: DataFrame): DataFrame = if (reliable) df.checkpoint() else df.localCheckpoint()

    // Partition count scales with the edge relation (~64k edges per task)
    // but never drops below ~parallelism/4: a small dup-edge set on a big
    // cluster must still spread its join rounds (collapsing to 2 tasks at
    // 32 cores serialized CC and cost ~0.1 scaling efficiency — round-2
    // measurement), while a billion-edge corpus fans out to 4x the cluster
    // parallelism. Sized from Catalyst's sizeInBytes estimate instead of a
    // count() job (r06): only the PARTITION COUNT depends on it, results
    // are partitioning-invariant (CCSpec asserts this), and the /64
    // divisor deliberately over-estimates edge count so error lands on
    // the more-partitions side; both the floor and the 4x-parallelism cap
    // still bound it.
    val estEdges = (edges.queryExecution.optimizedPlan.stats.sizeInBytes / 64)
      .min(BigInt(Long.MaxValue)).toLong
    val par = spark.sparkContext.defaultParallelism
    val floor = math.max(2, math.min(par / 4, 16))
    val byEdges = math.min(estEdges / 65536L + 1L, Int.MaxValue.toLong).toInt // no Int wrap at 1e14+ edges
    val ccParts = math.max(floor, math.min(math.max(par * 4, 8), byEdges))
    // Partitioned on v — the key every iteration's message join probes —
    // so the static edge relation is exchanged ONCE here instead of once
    // per round (guide §2.4 "two operations keyed the same way share one
    // exchange"; localCheckpoint preserves the hash partitioning, so
    // EnsureRequirements only exchanges the labels side each round).
    // No distinct() pass (r06): min-label propagation is unaffected by
    // duplicate edges (the per-round min aggregation absorbs duplicate
    // messages), and every in-repo caller feeds already-unique pair
    // relations — a caller with a HEAVY multigraph should dedup first,
    // since duplicates ride the per-round join instead of being dropped
    // once here.
    val sym = edges.select($"a".as("u"), $"b".as("v"))
      .union(edges.select($"b".as("u"), $"a".as("v")))
      .repartition(ccParts, $"v")
      .transform(ck)

    // Not checkpointed: iteration 1 references the initial labels twice
    // (message join + self-message union), but both subtrees canonicalize
    // identically so the distinct's exchange is planned once and reused;
    // eager materialization here would only add a job.
    var labels = sym.select($"u".as("url")).distinct()
      .withColumn("comp", $"url")

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // One pass: neighbor labels plus a tagged self-message, so the same
      // aggregation yields both the new min label and the previous label
      // (no extra join just to detect convergence).
      val msgs = sym.join(labels.withColumnRenamed("url", "v2"), $"v" === $"v2")
        .select($"u", $"comp", lit(false).as("self"))
        .union(labels.select($"url".as("u"), $"comp", lit(true).as("self")))
      val agg = msgs.groupBy($"u")
        .agg(min($"comp").as("comp"), max(when($"self", $"comp")).as("prev"))

      // pointer jumping: comp := min(comp, label(comp))
      val compOf = agg.select($"u".as("curl"), $"comp".as("ccomp"))
      val step2 = agg.join(compOf, agg("comp") === compOf("curl"), "left")
        .select(agg("u").as("url"),
          least(agg("comp"), coalesce($"ccomp", agg("comp"))).as("comp"),
          $"prev")

      // Convergence is counted WHILE the checkpoint job materializes
      // (accumulator incremented by the same tasks that write the blocks)
      // instead of by a separate filter+count job per round — one job per
      // iteration, not two. Only zero-vs-nonzero is read, so a rare
      // task retry inflating the count cannot change the decision: a
      // retried task re-observes the same deterministic rows.
      val changedAcc = spark.sparkContext.longAccumulator(s"graft.cc.changed.$iter")
      // Row-encoded pass-through: vertex ids may be strings (pipeline
      // urls) or numerics (SemDedup vec ids) — schema and values are
      // preserved exactly, only the side-effect count is added.
      val counted = step2.mapPartitions { it =>
          it.map { r => if (r.get(1) != r.get(2)) changedAcc.add(1L); r }
        }(org.apache.spark.sql.Encoders.row(step2.schema))
      val next = ck(counted)
      labels = next.select($"url", $"comp")
      converged = changedAcc.value == 0L
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter iterations")
    labels
  }
}
