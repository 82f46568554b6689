package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sketch.Sketches
import graft.text.Familiarity

/** DSIR-style importance resampling — data selection toward a target
  * distribution via hashed n-gram features (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"). The
  * published method fits bag-of-hashed-ngram unigram models over a
  * target corpus (e.g. Wikipedia-like formal text) and the raw source
  * corpus, scores every source document by its importance weight
  * p_target(doc)/p_source(doc), and samples the training corpus
  * proportionally to the weights. The reference system has no selection
  * surface (it ingests whole folders, /root/reference/src/pipelines/
  * ingestion.py); this is the corpus-assembly step a 100 TB pipeline
  * runs after dedup/quality gating to tilt the mixture toward a target
  * domain.
  *
  * Exact-integer deviation (same trick as [[graft.text.Familiarity]] and
  * the integer PageRank): the paper's log-likelihood-ratio
  * sum(c_b * (log p_b - log q_b)) is transcendental and not bit-portable
  * across engines, so the weight here is the linear ratio
  *
  *   w_ppm = (scale * sum_b c_b*p_ppm[b]) div (sum_b c_b*q_ppm[b])
  *
  * with add-one-smoothed integer frequencies
  * p_ppm[b] = (scale*(tgt_cnt[b]+1)) div (tgt_total + B) — every step is
  * BIGINT arithmetic a SQL oracle recomputes bit-for-bit. The ranking it
  * induces is the mean-target-frequency-vs-mean-source-frequency ratio of
  * the doc's hashed-bigram occurrences (a first-order surrogate for the
  * log ratio; documented deviation, pinned by DsirSpec's
  * target-like-beats-source-like ordering test).
  *
  * Features: word bigrams over the bounded [a-z ] alphabet
  * ([[Familiarity.normalized]]), hashed into B buckets with the repo's
  * md5-prefix 60-bit hash ([[Sketches.hash60]]) — the paper's hashed
  * n-gram trick, which bounds BOTH fitted models at B rows regardless of
  * corpus size.
  *
  * Scale shape at 100 TB: fit = one map-side-combinable groupBy bounded
  * at B rows per corpus (always broadcastable); apply = map-only bigram
  * explode + one BroadcastHashJoin + one partial-agg shuffle on doc id;
  * resampling = deterministic integer priority sampling (Duffield, Lund
  * & Thorup 2007: priority = weight/uniform, take top-k), which is a
  * distributed TakeOrdered — no global sort, no RNG state, reproducible
  * on any cluster size.
  */
object Dsir {

  /** One row per bigram OCCURRENCE: (id, bucket). Map-only (normalize,
    * split, consecutive-pair transform, explode, hash — all codegen'd);
    * docs with fewer than two normalized words vanish (no feature stream;
    * a curation gate length-rejects them upstream — same contract as
    * Familiarity.score). Both the fit and the apply aggregate DIRECTLY
    * off this relation, so neither pays a corpus-sized (id, bucket)
    * pre-aggregation shuffle.
    */
  private def bigramBuckets(docs: DataFrame, idCol: String, textCol: String,
                            buckets: Int): DataFrame =
    docs.select(col(idCol).as("id"), Familiarity.normalized(col(textCol)).as("ns"))
      .withColumn("w", split(col("ns"), " "))
      .withColumn("bgs", expr(
        "CASE WHEN size(w) >= 2 THEN " +
          "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) " +
          "ELSE array() END"))
      .select(col("id"), explode(col("bgs")).as("g"))
      .select(col("id"), pmod(Sketches.hash60(0, col("g")), lit(buckets.toLong)).as("bucket"))

  /** Per-doc hashed-bigram bucket counts: (id, bucket, cnt) — one row per
    * (doc, bucket) with cnt = number of bigram occurrences hashing there.
    * The materialized per-doc feature vector (e.g. for persisting a
    * batch's features); the fit/weight paths below deliberately do NOT go
    * through it — they aggregate occurrences directly.
    */
  def hashedBigramCounts(docs: DataFrame, idCol: String, textCol: String,
                         buckets: Int): DataFrame =
    bigramBuckets(docs, idCol, textCol, buckets)
      .groupBy("id", "bucket").agg(count(lit(1)).as("cnt"))

  /** Joint fit of the source and target hashed-bigram distributions with
    * add-one-smoothed integer frequencies: (bucket, src_cnt, tgt_cnt,
    * q_ppm, p_ppm), one row per bucket occurring in EITHER corpus —
    * full-outer semantics, so with an external target (the paper's
    * Wikipedia-target-vs-crawl-source setup) target mass hashing to
    * source-unseen buckets still counts toward t_tot and keeps its row,
    * instead of silently vanishing and misnormalizing p_ppm. In the
    * in-repo target-is-a-subset setup the extra rows never materialize
    * (every target bucket occurs in the source). q_ppm/p_ppm are the
    * smoothed per-occurrence frequencies in parts-per-`scale`:
    *   q_ppm = (scale*(src_cnt+1)) div (src_total + B)   [source]
    *   p_ppm = (scale*(tgt_cnt+1)) div (tgt_total + B)   [target]
    * Bounded at B rows — broadcastable at any corpus size.
    */
  def fitDists(source: DataFrame, target: DataFrame, idCol: String,
               textCol: String, buckets: Int, scale: Long = 1000000L): DataFrame = {
    // one flagged union -> ONE map-side-combinable bucket aggregate for
    // both distributions (instead of two separate corpus passes + a join);
    // the totals re-read of the <=B-row aggregate reuses its exchange at
    // execution (Spark's ReuseExchange)
    val u = bigramBuckets(source, idCol, textCol, buckets).withColumn("is_t", lit(0L))
      .unionByName(bigramBuckets(target, idCol, textCol, buckets).withColumn("is_t", lit(1L)))
    val joined = u.groupBy("bucket").agg(
      sum(lit(1L) - col("is_t")).as("src_cnt"),
      sum(col("is_t")).as("tgt_cnt"))
    val totals = joined.agg(sum("src_cnt").as("s_tot"), sum("tgt_cnt").as("t_tot"))
    joined.crossJoin(broadcast(totals))
      .withColumn("q_ppm", expr(s"(${scale}L * (src_cnt + 1L)) div (s_tot + ${buckets}L)"))
      .withColumn("p_ppm", expr(s"(${scale}L * (tgt_cnt + 1L)) div (t_tot + ${buckets}L)"))
      .select("bucket", "src_cnt", "tgt_cnt", "q_ppm", "p_ppm")
  }

  /** Per-document importance weights: (id, n_ngrams, w_ppm) with
    * w_ppm = (scale * sum c*p_ppm) div max(1, sum c*q_ppm). `dists` is
    * [[fitDists]] output (or any (bucket, q_ppm, p_ppm) table — e.g. a
    * persisted fit applied to a NEW crawl batch; buckets the fit never
    * saw contribute 0 to both sums, i.e. out-of-fit mass is ignored
    * rather than smoothed — only possible on cross-corpus apply, since a
    * same-corpus fit covers every occurring bucket). Plan: map-only
    * explode, one BroadcastHashJoin
    * against the ≤B-row fit, one partial-agg shuffle on id.
    */
  def importanceWeights(docs: DataFrame, dists: DataFrame, idCol: String,
                        textCol: String, buckets: Int,
                        scale: Long = 1000000L): DataFrame =
    bigramBuckets(docs, idCol, textCol, buckets)
      .join(broadcast(dists.select("bucket", "q_ppm", "p_ppm")), Seq("bucket"), "left")
      .groupBy("id").agg(
        count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("p_ppm"), lit(0L))).as("num"),
        sum(coalesce(col("q_ppm"), lit(0L))).as("den"))
      .withColumn("w_ppm", expr(s"(${scale}L * num) div greatest(den, 1L)"))
      .select("id", "n_ngrams", "w_ppm")

  /** Deterministic weighted sampling without replacement via integer
    * priority sampling (Duffield, Lund & Thorup 2007): each doc draws the
    * md5-uniform u in [1, scale] from its own id ([[Sampling.hashU]]'s
    * integer form, seed prefix "u:"), priority = (w_ppm * scale) div u,
    * keep the k largest priorities (ties by id). High-weight docs beat
    * low-weight docs in expectation exactly as w/u sampling prescribes,
    * with zero RNG state — the sample is a pure function of (corpus,
    * fit, k), identical on any cluster size. Plan: map-only priority
    * column + TakeOrdered top-k (per-partition heaps + driver merge of k
    * rows; no global sort).
    */
  def prioritySample(weights: DataFrame, idCol: String, k: Int,
                     scale: Long = 1000000L): DataFrame =
    weights
      .withColumn("priority", expr(s"(w_ppm * ${scale}L) div ${uSqlSpark(idCol, scale)}"))
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)

  /** The integer uniform as a Spark SQL fragment (shared shape with the
    * DuckDB oracle): 1 + (60-bit md5 of "u:"||id) mod scale.
    */
  private def uSqlSpark(idCol: String, scale: Long): String =
    s"(1L + pmod(cast(conv(substring(md5(concat('u:', cast($idCol as string))), 1, 15), 16, 10) as long), ${scale}L))"

  /** JVM-local md5-prefix 60-bit hash — the single-row mirror of
    * [[Sketches.hash60]] (md5 over UTF-8 bytes is bit-identical in the
    * JVM, Spark, and DuckDB).
    */
  def hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** Single-row importance weight with EXACTLY the distributed integer
    * semantics ([[importanceWeights]]): for stream-boundary gating, where
    * the fit is a broadcast Map(bucket -> (q_ppm, p_ppm)). None when the
    * doc has no bigram stream (fewer than two normalized words) — the
    * same docs the distributed apply drops.
    *
    * Locale caveat: this mirror lowercases with Locale.ROOT; Spark's
    * `lower()` uses the JVM default locale for non-ASCII input, so on a
    * special-casing default locale (tr_TR 'I'/'İ') non-ASCII text can
    * diverge from the batch apply. The production entrypoints
    * (tools/PipelineCli, tools/ChaosCheck) pin
    * `Locale.setDefault(Locale.ROOT)` at main() start (see also
    * StreamingDedup.dsirGateStream).
    */
  def weightPpmLocal(text: String, fit: Map[Long, (Long, Long)], buckets: Int,
                     scale: Long = 1000000L): Option[Long] = {
    val n = text.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z]+", " ").trim
    if (n.isEmpty) return None
    val w = n.split(" ")
    if (w.length < 2) return None
    var num = 0L
    var den = 0L
    var i = 0
    while (i < w.length - 1) {
      val b = math.floorMod(hash60Local("0:" + w(i) + " " + w(i + 1)), buckets.toLong)
      fit.get(b).foreach { case (q, p) => num += p; den += q }
      i += 1
    }
    Some((scale * num) / math.max(den, 1L))
  }
}
