package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe train/valid/test split assignment — the step between
  * dedup and training-data emission: if near-duplicate documents land in
  * different splits, eval is contaminated by construction (the model sees
  * the test set's near-copies during training). Keying the split hash on
  * the dedup CLUSTER id instead of the document key co-locates every
  * member of a near-dup component in one split, so zero dup pairs can
  * cross the boundary; singletons (no cluster row) fall back to their own
  * url as the key, which is the same distribution.
  *
  * The assignment is the md5-prefix uniform (Sampling.hashU) over the
  * split key — deterministic, engine-independent (the DuckDB oracle
  * recomputes it bit-for-bit), resumable (re-running assigns identical
  * splits), and subset-stable (changing fractions only moves boundary
  * keys). Scale shape: one left join on url (both sides hash-partition on
  * the join key; the cluster side holds only dup members, a small
  * fraction of the corpus) followed by a map-only CASE — no other
  * shuffle, no global ordering, no driver state.
  */
object Splits {

  /** Assign (url, split_key, split) for every row of `docs`; `clusters`
    * is the dedup output (url, cluster_id). split fractions:
    * [0,trainFrac) train, [trainFrac,trainFrac+validFrac) valid, rest
    * test.
    */
  def assign(docs: DataFrame, clusters: DataFrame,
             trainFrac: Double = 0.9, validFrac: Double = 0.05): DataFrame = {
    require(trainFrac >= 0 && validFrac >= 0 && trainFrac + validFrac <= 1.0,
      s"bad fractions: train=$trainFrac valid=$validFrac")
    val keyed = docs.select(col("url"))
      .join(clusters.select(col("url"), col("cluster_id")), Seq("url"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("url")))
    val u = Sampling.hashU(col("split_key"))
    keyed.select(col("url"), col("split_key"),
      when(u < lit(trainFrac), "train")
        .when(u < lit(trainFrac + validFrac), "valid")
        .otherwise("test").as("split"))
  }

  /** Cross-split leakage report over the verified dup pairs, for a given
    * assignment: (n_dup_pairs, n_cross_split). Cluster-keyed assignments
    * must report n_cross_split = 0 by construction (both endpoints of a
    * DUPLICATE verdict share a component, hence a split_key); url-keyed
    * assignments report the counterfactual damage. Two hash joins on url
    * against the (url, split) relation — pair-bounded, never corpus².
    */
  def leakage(dupPairs: DataFrame, assigned: DataFrame): DataFrame = {
    val sa = assigned.select(col("url").as("a"), col("split").as("split_a"))
    val sb = assigned.select(col("url").as("b"), col("split").as("split_b"))
    dupPairs.select("a", "b").join(sa, "a").join(sb, "b")
      .agg(count(lit(1)).as("n_dup_pairs"),
        sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L))
          .as("n_cross_split"))
  }
}
