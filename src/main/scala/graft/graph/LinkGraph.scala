package graft.graph

import graft.text.UrlOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over crawled pages: outlink extraction, host-graph
  * aggregation, and fixed-point PageRank. Link-based host quality is a
  * standard web-curation signal (Common-Crawl-style pipelines rank hosts by
  * centrality before sampling), and it is the one signal in this engine
  * computed from the page RELATIONS rather than page content.
  *
  * Scale shape:
  *   - `outlinks` is a per-row projection + explode — map-only, no shuffle;
  *     the href regex runs inside codegen (`regexp_extract_all` builtin).
  *   - `hostGraph` is one map-side-combinable groupBy on (src_host,
  *     dst_host): the edge relation out of 100 TB of pages is hosts², which
  *     aggregates down to millions of rows.
  *   - `hostRank` iterates join+groupBy on the AGGREGATED host graph —
  *     per-iteration cost scales with edges between hosts, not pages.
  *     Lineage is truncated every `checkpointEvery` iterations (the CC
  *     idiom; `reliable` switches to durable checkpoints for clusters).
  *
  * Determinism: ranks are fixed-point LONGS (units of 1/`scale`), all
  * arithmetic is integer (floor division via SQL `div`), so the result is
  * bit-identical regardless of partitioning, join order, or engine — the
  * DuckDB oracle (`q_host_rank`) re-runs the same recurrence with `//` and
  * must match exactly, with no float-quantization escape hatch.
  *
  * Recurrence (damping 85/100, S = scale, N = |hosts|):
  *   r0(h)    = S div N
  *   contrib  = (r(h) * w(h→g)) div outW(h)      per edge, floor per edge
  *   dang     = Σ r(h) over hosts with no out-edges
  *   r'(g)    = (15·S) div (100·N) + ((inflow(g) + dang div N) · 85) div 100
  * Floors leak mass (≤1 unit per edge per iteration), which is harmless
  * for a ranking and the price of exactness.
  */
object LinkGraph {

  /** href extraction regex: absolute http(s) anchors in double quotes —
    * the synthetic corpus shape; real crawls would extend this (relative
    * URLs, unquoted attrs) without changing the operator's plan shape.
    */
  val HrefPattern = "href=\"(https?://[^\"]+)\""

  /** (src, dst) edge per anchor in the page html. Map-only. */
  def outlinks(pages: DataFrame): DataFrame =
    pages.select(
      col("url").as("src"),
      explode(regexp_extract_all(col("html").cast("string"),
        lit(HrefPattern), lit(1))).as("dst"))

  /** Full anchor-tag pattern: group 1 = absolute target URL, group 2 =
    * the anchor text (tag-free inner text, the common crawl-pipeline
    * shape). Character-class-bounded, so Java and RE2 agree exactly.
    */
  val AnchorPattern = "<a href=\"(https?://[^\"]+)\"[^>]*>([^<]*)</a>"

  /** (src, dst, anchor) per `<a>` tag — the inbound-description signal:
    * anchor text is what OTHER pages call a target, a relevance/quality
    * feature content-only pipelines cannot compute. Map-only: one
    * regexp_extract_all explode, two codegen'd group extractions.
    */
  def anchors(pages: DataFrame): DataFrame =
    pages.select(col("url").as("src"),
        explode(regexp_extract_all(col("html").cast("string"),
          lit(AnchorPattern), lit(0))).as("tag"))
      .select(col("src"),
        regexp_extract(col("tag"), AnchorPattern, 1).as("dst"),
        regexp_extract(col("tag"), AnchorPattern, 2).as("anchor"))

  /** Inbound anchor-text profile per canonical target host:
    * (dst_host, anchor, n_anchors). One map-side-combinable groupBy —
    * output is bounded by distinct (host, anchor) pairs, not pages.
    */
  def hostAnchorProfile(anchorDf: DataFrame): DataFrame =
    anchorDf
      .select(UrlOps.hostOf(col("dst")).as("dst_host"), col("anchor"))
      .groupBy("dst_host", "anchor")
      .agg(count(lit(1)).as("n_anchors"))

  /** Centrality-gated deterministic sample — the link signal feeding the
    * curation gate (CCNet-style head selection): keep pages hosted on the
    * `topK` hosts by PageRank (total order (rank desc, host asc), so the
    * cut is deterministic), then the standard md5-derived uniform keeps
    * each surviving URL with probability `rate` (Sampling.hashU — same
    * decision on every run and any partitioning). Plan shape: the top-K
    * host list is a tiny broadcast; the page side is one map-only
    * project + broadcast-hash semi-join + per-row filter — no shuffle of
    * the 100 TB side.
    */
  def rankGatedSample(pages: DataFrame, ranks: DataFrame, topK: Int,
                      rate: Double): DataFrame = {
    val top = ranks.orderBy(desc("rank"), asc("host")).limit(topK)
    pages.select(col("url"), UrlOps.hostOf(col("url")).as("host"))
      .join(broadcast(top), Seq("host"))
      .filter(graft.sample.Sampling.hashU(col("url")) < lit(rate))
      .select(col("url"), col("host"), col("rank"))
  }

  /** Host-level multigraph: (src_host, dst_host, n_links), hosts
    * canonicalized through UrlOps.hostOf (lowercase, www-stripped).
    */
  def hostGraph(links: DataFrame): DataFrame =
    links
      .select(UrlOps.hostOf(col("src")).as("src_host"),
        UrlOps.hostOf(col("dst")).as("dst_host"))
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))

  /** Fixed-point PageRank over the host graph. Returns (host, rank) with
    * rank in units of 1/`scale`, ordered rank desc then host asc.
    *
    * Overflow bound: rank ≤ scale (1e12 default) and the per-edge product
    * rank·n_links stays under Long.Max while n_links < 9e6 per host pair —
    * beyond that, pre-normalize the edge weights.
    */
  def hostRank(edges: DataFrame, iters: Int = 10,
               scale: Long = 1000000000000L, checkpointEvery: Int = 4,
               reliable: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    if (reliable) require(spark.sparkContext.getCheckpointDir.isDefined,
      "reliable=true requires spark.sparkContext.setCheckpointDir(<durable dir>)")
    def ck(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()

    val e = edges.select(col("src_host"), col("dst_host"),
      col("n_links").cast("long").as("n_links")).persist()
    val hosts = e.select(col("src_host").as("host"))
      .union(e.select(col("dst_host").as("host"))).distinct().persist()
    val outW = e.groupBy("src_host").agg(sum("n_links").as("out_w")).persist()
    // N is a structural scalar (host count), not data — same class as the
    // CC partition-count probe; base/seed are then plain literals.
    val n = hosts.count()
    require(n > 0, "hostRank needs a non-empty edge set")
    val base = (scale * 15L) / (100L * n)

    var rank = hosts.select(col("host"), lit(scale / n).as("rank"))
    var i = 1
    while (i <= iters) {
      val contrib = e
        .join(rank.withColumnRenamed("host", "src_host"), "src_host")
        .join(outW, "src_host")
        .select(col("dst_host").as("host"),
          expr("(rank * n_links) div out_w").as("contrib"))
      val inflow = contrib.groupBy("host")
        .agg(sum("contrib").as("inflow"))
      // dangling mass stays in-plan: a 1-row aggregate broadcast-crossed
      // back in, no driver collect per iteration
      val dang = rank
        .join(outW.select(col("src_host").as("host")), Seq("host"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0L)).as("dang"))
      rank = hosts
        .join(inflow, Seq("host"), "left")
        .crossJoin(broadcast(dang))
        .select(col("host"), expr(
          s"CAST($base AS BIGINT) + " +
            s"(((coalesce(inflow, CAST(0 AS BIGINT))) + (dang div CAST($n AS BIGINT))) * 85) div 100"
        ).as("rank"))
      if (i % checkpointEvery == 0 && i < iters) rank = ck(rank)
      i += 1
    }
    rank.orderBy(desc("rank"), asc("host"))
  }
}
