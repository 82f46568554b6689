package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curation emission — the step after clustering that produces the corpus a
  * training run actually reads: keep ONE representative per duplicate
  * cluster plus every unclustered document. The reference stops at cluster
  * assignments (near_duplicate.py:364-371 emits clusters; selection is left
  * to the GUI); a 100 TB pipeline needs the emission as an operator.
  *
  * Keep policy: per-cluster argmax by (n_tokens DESC, url ASC) — retain the
  * longest member (dup families on the web are truncations/mirrors of one
  * canonical page; the longest is the most complete), ties broken
  * deterministically by url.
  *
  * Scale shape: the argmax is `min(struct(-n_tokens, url))` — a PARTIAL
  * aggregation (map-side combine, one shuffle by cluster_id, constant state
  * per group), NOT a row_number window: a window would sort every member of
  * every cluster and a boilerplate-glued mega-cluster would serialize into
  * one task. Unclustered docs are one anti-join (broadcast or shuffle,
  * AQE's choice).
  */
object Curate {

  /** One row per RETAINED document: (url, cluster_id, cluster_size,
    * n_tokens); cluster_id is NULL and cluster_size 1 for unclustered docs.
    *
    * @param clusters pipeline 07_clusters shape (url, cluster_id, cluster_size)
    * @param norm     pipeline 01_norm shape (url, n_tokens, ...)
    */
  def keepBest(clusters: DataFrame, norm: DataFrame): DataFrame = {
    val n = norm.select(col("url"), col("n_tokens"))
    val cl = clusters.select(col("url"), col("cluster_id"), col("cluster_size"))
    val best = cl.join(n, "url")
      .groupBy(col("cluster_id"))
      .agg(
        min(struct((-col("n_tokens")).as("neg"), col("url"))).as("best"),
        max(col("cluster_size")).as("cluster_size"))
      .select(col("best.url").as("url"), col("cluster_id"),
        col("cluster_size"), (-col("best.neg")).as("n_tokens"))
    val unclustered = n.join(cl.select(col("url")), Seq("url"), "left_anti")
      .select(col("url"), lit(null).cast("string").as("cluster_id"),
        lit(1L).as("cluster_size"), col("n_tokens"))
    best.unionByName(unclustered)
  }
}
