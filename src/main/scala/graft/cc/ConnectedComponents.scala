package graft.cc

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  * Large inputs are dictionary-encoded first (r06): vertex keys are mapped
  * to ORDER-PRESERVING dense longs (sort + zipWithIndex), the iteration
  * runs entirely on 16-byte long pairs instead of ~100+-byte url strings,
  * and labels are decoded back through the dictionary at the end. Because
  * the mapping is an order isomorphism and every operation in the loop is
  * min() or an equality join, the decoded result is bit-identical to the
  * direct computation — min-of-ids maps to min-of-urls. The encode costs
  * two edge-scale joins once; each round then shuffles ~7x fewer bytes and
  * compares longs instead of UTF8Strings. Gated on estimated edge count so
  * small graphs (every correctness-tier input) keep the join-free direct
  * path; `forceIdEncoding` pins either path for tests.
  *
  * Replaces the reference's driver-side DSU
  * (/root/reference/src/pipelines/near_duplicate.py:335-371) — a Python
  * dict union-find cannot hold 10^12 vertices; this shuffles on the edge
  * key instead.
  */
object ConnectedComponents {

  /** Edge-count gate for the dictionary-encoded loop: below this the two
    * encode joins + decode joins cost more than the per-round byte savings
    * (the sandbox bench tiers sit far below; the 450k scaling corpus at
    * ~3M dup edges sits far above).
    */
  final val IdEncodingMinEdges = 500000L

  /** @param edges DataFrame with two same-typed orderable columns (a, b),
    *        undirected; callers pass unique pair relations (duplicate
    *        edges are correctness-neutral but ride every round's join).
    * @param reliable use durable checkpoint() (requires a configured
    *        checkpoint dir) instead of localCheckpoint for the per-round
    *        lineage truncation — executor-loss-safe on real clusters.
    * @param forceIdEncoding Some(true/false) pins the dictionary-encoded
    *        vs direct loop (tests); None = size-gated.
    * @return DataFrame (url, comp) where comp = min key of the component
    *         (lexicographic for strings). Covers only vertices incident
    *         to an edge.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 25,
          reliable: Boolean = false,
          forceIdEncoding: Option[Boolean] = None): DataFrame = {
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
    // count() job (r06): only the PARTITION COUNT and the id-encoding gate
    // depend on it, results are partitioning-invariant (CCSpec asserts
    // this), and the /64 divisor deliberately over-estimates edge count so
    // error lands on the more-partitions side; both the floor and the
    // 4x-parallelism cap still bound it.
    val estEdges = (edges.queryExecution.optimizedPlan.stats.sizeInBytes / 64)
      .min(BigInt(Long.MaxValue)).toLong
    val par = spark.sparkContext.defaultParallelism
    val floor = math.max(2, math.min(par / 4, 16))
    val byEdges = math.min(estEdges / 65536L + 1L, Int.MaxValue.toLong).toInt // no Int wrap at 1e14+ edges
    val ccParts = math.max(floor, math.min(math.max(par * 4, 8), byEdges))

    val sym0 = edges.select($"a".as("u"), $"b".as("v"))
      .union(edges.select($"b".as("u"), $"a".as("v")))

    val useIds = forceIdEncoding.getOrElse(estEdges >= IdEncodingMinEdges)
    if (!useIds) {
      minLabelLoop(spark, sym0, ccParts, ck, maxIter)
    } else {
      // Order-preserving dense ids: sort the distinct vertex keys once and
      // number them. zipWithIndex numbers rows in partition order, and the
      // preceding global sort makes that order the key order, so
      // vid_x < vid_y  <=>  key_x < key_y (a strict order isomorphism).
      val verts = sym0.select($"u").distinct().orderBy($"u")
      val keyField = verts.schema.fields(0).copy(name = "vurl")
      val ids = ck(spark.createDataFrame(
        verts.rdd.zipWithIndex().map { case (r, i) => Row(r.get(0), i) },
        StructType(Seq(keyField, StructField("vid", LongType, nullable = false)))))
      val symIds = sym0
        .join(ids.withColumnRenamed("vurl", "u2").withColumnRenamed("vid", "uid"), $"u" === $"u2")
        .join(ids.withColumnRenamed("vurl", "v2").withColumnRenamed("vid", "vid2"), $"v" === $"v2")
        .select($"uid".as("u"), $"vid2".as("v"))
      val labelIds = minLabelLoop(spark, symIds, ccParts, ck, maxIter)
      // decode: vertex id -> key, component id -> key (min id = min key)
      labelIds
        .join(ids.withColumnRenamed("vid", "uid"), $"url" === $"uid")
        .select($"vurl".as("out_url"), $"comp")
        .join(ids.withColumnRenamed("vurl", "curl").withColumnRenamed("vid", "cid"),
          $"comp" === $"cid")
        .select($"out_url".as("url"), $"curl".as("comp"))
    }
  }

  /** The min-label + pointer-jumping fixed point over a symmetric edge
    * relation (u, v) of any orderable key type. Returns (url, comp) in the
    * edge key type.
    */
  private def minLabelLoop(spark: SparkSession, sym0: DataFrame, ccParts: Int,
                           ck: DataFrame => DataFrame, maxIter: Int): DataFrame = {
    import spark.implicits._
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
    val sym = sym0.repartition(ccParts, $"v").transform(ck)

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
      // urls), numerics (SemDedup vec ids) or the dictionary longs —
      // schema and values are preserved exactly, only the side-effect
      // count is added.
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
