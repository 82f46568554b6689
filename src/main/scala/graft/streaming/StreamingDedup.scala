package graft.streaming

import graft.model.Schemas.Page
import graft.norm.TextNorm
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming ingestion operators for a training-data pipeline.
  *
  * The reference system is batch-only (SURVEY.md §2.12) — these are the
  * training-pipeline extensions a 100 TB crawl ingest needs: exact dedup at
  * the stream boundary (the streaming form of A7/`Sources.dedupIngest`) and
  * watermarked windowed corpus metrics. Both are pure
  * `readStream → transform → writeStream` declarative plans: state is
  * managed by Spark's streaming state store (RocksDB-backed on a real
  * cluster) and pruned — by watermark (dedupStream) or by state timeout
  * (the keyed-state operators) — no unbounded driver state.
  */
object StreamingDedup {

  /** Content hash over the SAME normalize chain as the batch pipeline
    * (byte-parity surface), so stream-deduped and batch-deduped corpora
    * agree on what "exact duplicate" means.
    */
  val contentHashUdf = udf((text: String) =>
    TextNorm.contentHash(TextNorm.normalize(text)))

  /** Exact-dedup a stream of pages: the first occurrence per content hash
    * within the watermark horizon wins. `dropDuplicatesWithinWatermark`
    * prunes state once an event-time key falls behind the watermark — the
    * unbounded-state trap of plain dropDuplicates is avoided, which is the
    * difference between a demo and a 100 TB ingest.
    */
  def dedupStream(pages: DataFrame, textCol: String = "text",
                  tsCol: String = "warc_ts", watermark: String = "1 hour"): DataFrame =
    pages
      .withColumn("content_hash", contentHashUdf(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Custom-state variant (KeyValueGroupedDataset.flatMapGroupsWithState):
    * emits the first page per content hash, keeps a seen marker. With
    * `stateTimeout = Some(d)` idle hashes are evicted after `d` of wall
    * clock (processing-time horizon — note that the timeout makes Spark
    * schedule continuous no-data micro-batches to fire evictions, so
    * bounded drivers like processAllAvailable never quiesce; production
    * streams with a real trigger interval are unaffected). `None` keeps
    * state forever (bounded corpora / tests).
    */
  def dedupStreamStateful(spark: SparkSession, pages: Dataset[Page],
                          stateTimeout: Option[String] = Some("2 hours")): Dataset[Page] = {
    import spark.implicits._
    val mode = stateTimeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    pages
      .groupByKey(p => TextNorm.contentHash(TextNorm.normalize(p.text)))
      .flatMapGroupsWithState(OutputMode.Append, mode)(
        (_: String, rows: Iterator[Page], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // hash already seen within the state horizon
          } else {
            state.update(true)
            stateTimeout.foreach(state.setTimeoutDuration)
            rows.take(1)
          }
        })
  }

  /** Streaming NEAR-duplicate candidate generation: each page is signed
    * with the batch pipeline's MinHash (same config → same buckets as the
    * batch path), exploded into its LSH band keys, and matched against a
    * per-(band,bucket) keyed state of previously seen urls
    * (flatMapGroupsWithState — the state store holds at most
    * `maxBucketUrls` urls per bucket, the streaming form of the batch
    * mega-bucket guard).
    *
    * Emission is at-least-once per candidate pair (a pair colliding in
    * several bands or re-arriving is emitted again): downstream
    * verification is idempotent by pair_key, exactly like the batch
    * pipeline's distinct(). Pairs are (a, b) with a < b.
    *
    * State retention: the per-bucket url cap bounds each ENTRY, and
    * `stateTimeout` bounds the entry COUNT — idle (band, bucket) keys are
    * evicted after that much processing time, so a long-running stream's
    * bucket-key state can't grow without bound. `None` keeps state forever
    * (bounded corpora / tests — same caveat as dedupStreamStateful: a
    * processing-time timeout schedules continuous no-data micro-batches,
    * so processAllAvailable-driven tests should pass None).
    */
  def nearDupCandidates(spark: SparkSession, pages: Dataset[Page],
                        conf: graft.DedupConfig = graft.DedupConfig.balanced,
                        maxBucketUrls: Int = 64,
                        stateTimeout: Option[String] = Some("2 hours"),
                        hotShingles: Array[Long] = null): Dataset[(String, String)] = {
    import spark.implicits._
    // A stream cannot compute corpus-level shingle df, so under a
    // suppression config the caller MUST supply the batch run's persisted
    // hot set (`$runDir/03_hot`, sorted) — signing with an empty set while
    // the batch side suppresses would make streaming candidates
    // incomparable with batch signatures. Same frozen-vocabulary semantics
    // as IncrementalDedup.
    require(conf.boilerplateMaxDfFrac.isEmpty || hotShingles != null,
      "suppression config: pass the batch run's persisted 03_hot set as hotShingles")
    val hot = if (hotShingles == null) Array.emptyLongArray else hotShingles
    val bcHot = spark.sparkContext.broadcast(hot)
    val c = conf
    val bandRows: Dataset[(Long, String)] = pages.mapPartitions { it =>
      val (as, bs) = graft.sig.MinHashSig.permutations(c.numPerm, c.seed)
      val graft.lsh.LshParams.BandsRows(b, r) = graft.lsh.LshParams.optimal(
        c.lshThreshold, c.numPerm, c.lshFpWeight, c.lshFnWeight)
      it.flatMap { p =>
        if (p.text == null || p.text.trim.isEmpty) Iterator.empty
        else {
          val d = graft.plans.DedupPipeline.normalizeDoc(p.url, p.text, p.lang)
          val sig = graft.plans.DedupPipeline.signDoc(d, c, as, bs, bcHot.value)
          (0 until b).iterator.map { band =>
            // key packs (band, bucket-hash) into one long group key
            val bucket = graft.hash.XXH64.hashLongs(
              sig.minhash, band * r, band * r + r, band.toLong)
            (bucket * 31L + band, p.url)
          }
        }
      }
    }
    val mode = stateTimeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    bandRows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, mode)(
        (_: Long, rows: Iterator[(Long, String)], state: GroupState[Seq[String]]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          val seen = state.getOption.getOrElse(Seq.empty)
          // admit only up to the bucket's remaining capacity — the cap
          // bounds BOTH the O(n^2) within-batch pair emission and the
          // buffered urls (a mega-bucket micro-batch is truncated here
          // exactly like the batch pipeline drops mega-buckets), so the
          // state function never materializes an unbounded group
          val capacity = math.max(0, maxBucketUrls - seen.size)
          val seenSet = seen.toSet
          val admitted = scala.collection.mutable.ArrayBuffer.empty[String]
          val admittedSet = scala.collection.mutable.HashSet.empty[String]
          while (rows.hasNext && admitted.size < capacity) {
            val u = rows.next()._2
            if (!seenSet.contains(u) && admittedSet.add(u)) admitted += u
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          // new vs stored, plus new vs new within this batch
          admitted.foreach { u =>
            seen.foreach(v => if (u != v) out += (if (u < v) (u, v) else (v, u)))
          }
          for (i <- admitted.indices; j <- (i + 1) until admitted.size) {
            val (u, v) = (admitted(i), admitted(j))
            out += (if (u < v) (u, v) else (v, u))
          }
          state.update(seen ++ admitted)
          stateTimeout.foreach(state.setTimeoutDuration)
          out.distinct.iterator
          }
        })
  }

  /** Stateless per-row curation gates at the stream boundary — the BATCH
    * gates applied unchanged to a stream: quality score (TextOps.quality,
    * the q_quality_score chain), OOV rate against a broadcast vocabulary
    * (text/Vocab semantics), and benchmark decontamination against a
    * broadcast eval n-gram set (Decontaminate.containsFlagged — membership
    * only, so no aggregation state). Everything is a broadcast lookup plus
    * per-row arithmetic: the plan is map-only, runs in Append mode with no
    * watermark and no state store, and composes with dedupStream
    * downstream (curate first — it shrinks the dedup state's key space).
    *
    * Batch parity, exactly: the text is tokenized ONCE with the
    * Vocab.oovStats tokenizer (trim+lowercase+split \s+ — an empty or
    * whitespace-only doc tokenizes to [""], which is OOV, so oov_rate is
    * 1.0 and the doc drops whenever maxOovRate < 1, same as the batch
    * path), and the same token array feeds the decontamination check.
    * Null text is normalized to "" first (a stream may carry it; the
    * batch reader never does).
    */
  def curateStream(spark: SparkSession, pages: Dataset[Page],
                   vocab: Set[String], evalNgrams: Set[String], n: Int = 8,
                   minQuality: Double = 0.0, maxOovRate: Double = 1.0): Dataset[Page] = {
    val bcV = spark.sparkContext.broadcast(vocab)
    val bcE = spark.sparkContext.broadcast(evalNgrams)
    pages.filter { p =>
      val text = if (p.text == null) "" else p.text
      graft.text.TextOps.quality(text).score >= minQuality && {
        val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        val oov = toks.count(t => !bcV.value(t)).toDouble / toks.length
        oov <= maxOovRate &&
          !graft.text.Decontaminate.containsFlagged(toks, bcE.value, n)
      }
    }
  }

  /** DSIR importance-weight gate at the stream boundary: keep pages whose
    * hashed-bigram target/source ratio (sample/Dsir, exact integer
    * semantics via [[graft.sample.Dsir.weightPpmLocal]]) clears the
    * threshold. The fit is the ≤B-row Map from a BATCH
    * [[graft.sample.Dsir.fitDists]] run, broadcast once — so the stream
    * applies the SAME model the batch corpus assembly used, and stream
    * membership equals the batch apply's (asserted in
    * StreamingCurateSpec). Stateless map-only plan: no watermark, no
    * state store, composes with curateStream/dedupStream. Docs without a
    * bigram stream drop, matching the distributed apply.
    *
    * Locale caveat (shared with every JVM-local mirror in this repo —
    * Vocab/Winnow/Decontaminate): the local lowercase pins Locale.ROOT,
    * while Spark's `lower()` falls back to the JVM default locale for
    * non-ASCII input. On a JVM whose default locale has special casing
    * (e.g. tr_TR 'I'/'İ') a non-ASCII text can make stream membership
    * diverge from the batch apply. The production entrypoints
    * (tools/PipelineCli, tools/ChaosCheck) now pin
    * `Locale.setDefault(Locale.ROOT)` at main() start, closing this;
    * Verify/Bench run under the sandbox's en default, which has no
    * special casing either.
    */
  def dsirGateStream(spark: SparkSession, pages: Dataset[Page],
                     fit: Map[Long, (Long, Long)], buckets: Int,
                     minWeightPpm: Long): Dataset[Page] = {
    val bc = spark.sparkContext.broadcast(fit)
    pages.filter { p =>
      val text = if (p.text == null) "" else p.text
      graft.sample.Dsir.weightPpmLocal(text, bc.value, buckets)
        .exists(_ >= minWeightPpm)
    }
  }

  /** Watermarked sliding corpus metrics: per-window language histogram —
    * the streaming twin of q_lang_hist. Late data beyond the watermark is
    * dropped, closed windows are emitted exactly once in Append mode.
    */
  def windowedLangHistogram(pages: DataFrame, windowLen: String = "10 minutes",
                            watermark: String = "30 minutes"): DataFrame =
    pages
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowLen), col("lang"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("lang"), col("cnt"))

  /** Streaming count-min sketch over the token stream: the SAME cell
    * derivation as Sketches.countMinSketch as a streaming aggregation in
    * Update mode. This is the sketch merge law operationalized — state is
    * the d*w counter grid (bounded regardless of stream volume; no
    * watermark or eviction needed), each micro-batch's partial counts
    * fold in by cell-wise SUM, and after any prefix of the stream the
    * state equals the batch sketch of the rows seen so far
    * (StreamingCurateSpec asserts it against Sketches.countMinSketch).
    */
  def streamingCms(pages: DataFrame, textCol: String, d: Int, w: Int): DataFrame = {
    val toks = pages.select(
      explode(graft.text.Decontaminate.tokensCol(col(textCol))).as("tok"))
    // the batch cell derivation works unchanged on a streaming frame —
    // one implementation, so batch and stream sketches cannot drift
    graft.sketch.Sketches.countMinSketch(toks, "tok", d, w)
  }
}
