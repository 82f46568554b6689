package graft.plans

import graft.DedupConfig
import graft.cc.ConnectedComponents
import graft.hash.XXH64
import graft.lsh.LshParams
import graft.model.Schemas._
import graft.norm.TextNorm
import graft.sa.SuffixLCS
import graft.sig.{CheapEmbed, MinHashSig, SimHash}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end near-duplicate detection + clustering pipeline.
  *
  * Spark shape (SURVEY.md §3.1): table scan → normalize select → signature
  * mapPartitions → band explode/groupBy (shuffle 1) → bucket self-join
  * (shuffle 2) → pair verify join back to signatures (shuffle 3) → decision
  * select → CC iterations → writes. Stage boundaries are the checkpoint /
  * resume points; per-stage, per-partition lineage is written alongside
  * outputs (north rule).
  *
  * Scale notes:
  *  - Signatures carry HASHED shingle sets (sorted distinct xxh64), not
  *    shingle strings — pair verification is a merge-count. The pair join
  *    itself ships only fixed-width signature columns; the size-unbounded
  *    shingle arrays join in only for the estimate-uncertainty band
  *    (verifyStage Scaladoc).
  *  - The embedding learner only decides pairs where exactly need-1 of the
  *    other votes fired (arbiter consensus is monotone), so embeddings are
  *    computed for that small pair subset only, never for the whole corpus.
  *  - Mega-buckets (boilerplate-heavy pages) are dropped with a logged
  *    metric, mirroring the reference's per-doc candidate caps
  *    (near_duplicate.py:36-37,408-417); AQE skew-join handles the rest.
  */
object DedupPipeline {

  /** Canonical shingle-hash seed lives in sig/Shingles (shared with the
    * boilerplate-df operator); kept here as an alias for existing callers.
    */
  final val ShingleHashSeed = graft.sig.Shingles.HashSeed

  /** Materialize a reused relation: localCheckpoint by default (blocks on
    * executors, reclaimed by the ContextCleaner), reliable checkpoint()
    * when conf.reliableCheckpoints — see the DedupConfig field Scaladoc.
    */
  private[graft] def ckpt(spark: SparkSession, df: DataFrame, conf: DedupConfig): DataFrame =
    if (conf.reliableCheckpoints) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        "reliableCheckpoints=true requires spark.sparkContext.setCheckpointDir(<durable dir>)")
      df.checkpoint()
    } else df.localCheckpoint()

  // ---------- per-doc pure functions ----------

  def normalizeDoc(url: String, text: String, lang: String): DocNorm = {
    val norm = TextNorm.normalize(text)
    val toks = TextNorm.tokenize(norm)
    DocNorm(url, norm, TextNorm.exactHash(norm), TextNorm.contentHash(norm), toks.length, lang)
  }

  def signDoc(d: DocNorm, conf: DedupConfig, as: Array[Long], bs: Array[Long],
              hotShingles: Array[Long] = Array.emptyLongArray): DocSig = {
    // One whitespace split serves both learners: the SimHash tokenizer keeps
    // every token of length >= minTokenLen (empty stopword set —
    // simhash_model.py:48), the MinHash tokenizer additionally drops the
    // default stopwords (text_preproc.py:126-151). Shingle identity via
    // hash-combining the per-token hashes (sig/Shingles Scaladoc). Hot
    // (boilerplate) shingles are suppressed from the set-based learner only
    // — SimHash stays token-weighted over the full text.
    val simToks = TextNorm.simhashTokens(d.norm_text, conf.minTokenLen)
    val toks = simToks.filterNot(TextNorm.DefaultStopwords)
    val distinctSorted = graft.sig.Boilerplate.suppress(
      graft.sig.Shingles.fromTokens(toks, conf.shingleSize), hotShingles)
    val mh =
      if (conf.signerOph) graft.sig.Oph.signature(distinctSorted, conf.numPerm)
      else MinHashSig.signature(distinctSorted, as, bs)
    val s = SimHash.fromTokens(simToks, conf.maxTokenWeight, conf.simhashBits)
    DocSig(d.url, d.exact_hash, distinctSorted.length, distinctSorted, mh, s.hi, s.lo)
  }

  // ---------- stages ----------

  /** Stage 1: normalize. */
  def normalizeStage(spark: SparkSession, pages: Dataset[Page]): Dataset[DocNorm] = {
    import spark.implicits._
    // F1: drop empty-text docs up front (near_duplicate.py:103)
    pages.filter(p => p.text != null && p.text.trim.nonEmpty)
      .mapPartitions(_.map(p => normalizeDoc(p.url, p.text, p.lang)))
  }

  /** Stage 2: signatures (MinHash + SimHash + hashed shingle set), with
    * optional boilerplate-shingle suppression (sorted hot array, broadcast).
    */
  def signatureStage(spark: SparkSession, norm: Dataset[DocNorm], conf: DedupConfig,
                     hotShingles: Array[Long] = Array.emptyLongArray): Dataset[DocSig] = {
    import spark.implicits._
    val numPerm = conf.numPerm
    val seed = conf.seed
    val c = conf
    val bcHot = spark.sparkContext.broadcast(hotShingles)
    norm.mapPartitions { it =>
      val (as, bs) = MinHashSig.permutations(numPerm, seed)
      val hot = bcHot.value
      it.map(d => signDoc(d, c, as, bs, hot))
    }
  }

  /** Stage 3: LSH banding — explode each signature into b (band, bucket) keys. */
  def bandingStage(spark: SparkSession, sigs: Dataset[DocSig], conf: DedupConfig): Dataset[BandRow] = {
    import spark.implicits._
    val LshParams.BandsRows(b, r) =
      LshParams.optimal(conf.lshThreshold, conf.numPerm, conf.lshFpWeight, conf.lshFnWeight)
    sigs.flatMap { s =>
      val rows = new Array[BandRow](b)
      var band = 0
      while (band < b) {
        rows(band) = BandRow(band, XXH64.hashLongs(s.minhash, band * r, band * r + r, band.toLong), s.url)
        band += 1
      }
      rows
    }
  }

  /** Stage 4: candidate pairs — bucket self-join with mega-bucket guard and
    * per-doc caps. Returns (pairs, droppedBucketCount).
    */
  def candidateStage(spark: SparkSession, bands: Dataset[BandRow], conf: DedupConfig): (Dataset[CandPair], Long) = {
    import spark.implicits._
    val g = graft.lsh.BucketGuard.okBuckets(spark, bands.toDF(), conf.maxBucketSize, "pipeline")
    val bx = bands.toDF().join(g.ok, Seq("band", "bucket"))
      .select($"band", $"bucket", $"url")
    val dropped = g.dropped
    val left = bx.select($"band", $"bucket", $"url".as("a"))
    val right = bx.select($"band".as("band2"), $"bucket".as("bucket2"), $"url".as("b"))
    val joined = left.join(right,
        $"band" === $"band2" && $"bucket" === $"bucket2" && $"a" < $"b")
      .select($"a", $"b")
    // Dedup + per-doc candidate cap (near_duplicate.py:408) fused into ONE
    // exchange: hash-route the raw bucket pairs by doc `a`, sort each
    // partition by (a, b), then stream: duplicates (the same pair emitted
    // by several bands) are adjacent and skipped, and each doc keeps its
    // first `cap` partners by partner url. Replaces the previous
    // distinct (pair exchange) + row_number window (second pair exchange +
    // per-doc sort): identical output set — the partition sort uses the
    // same binary UTF8String ordering as the window's ORDER BY b — for
    // one exchange instead of two and no window operator. The streaming
    // pass holds O(1) state per row (previous partner + kept counter) and
    // the sort spills gracefully; a collect_set fusion was tried first
    // and rejected — its per-group array state trips ObjectHashAggregate's
    // sort-based fallback at real pair volumes (measured +21% on 05_cand
    // at the 450k scaling corpus).
    val cap = conf.maxCandidatesPerDoc
    val capped = joined
      .repartition($"a")
      .sortWithinPartitions($"a", $"b")
      .as[(String, String)]
      .mapPartitions { it =>
        new Iterator[(String, String)] {
          private var curA: String = null
          private var prevB: String = null
          private var kept = 0
          private var nextPair: (String, String) = null
          private def advance(): Unit = {
            nextPair = null
            while (nextPair == null && it.hasNext) {
              val p = it.next()
              if (p._1 != curA) { curA = p._1; prevB = null; kept = 0 }
              if (p._2 != prevB && kept < cap) {
                prevB = p._2; kept += 1; nextPair = p
              } else prevB = p._2
            }
          }
          advance()
          def hasNext: Boolean = nextPair != null
          def next(): (String, String) = { val r = nextPair; advance(); r }
        }
      }.toDF("a", "b")
    (domainCap(spark, capped, conf).as[CandPair], dropped)
  }

  /** Optional per-DOMAIN candidate cap (DedupConfig.maxCandidatesPerDomain)
    * — bounds the pairs a single template-heavy domain can contribute.
    * Deterministic (first `cap` pairs by (a, b) per domain of `a`) and
    * skew-safe: flooded domains are capped with a salted two-phase top-k,
    * so no task ever sorts more than ~64 x cap rows even when one domain
    * holds billions of pairs; unflooded domains bypass the windows
    * entirely via an anti-join on the (tiny) flooded-domain set.
    */
  private[graft] def domainCap(spark: SparkSession, pairs: DataFrame, conf: DedupConfig): DataFrame = {
    import spark.implicits._
    conf.maxCandidatesPerDomain match {
      case None => pairs
      case Some(cap) =>
        val withDom = pairs.withColumn("dom", graft.text.UrlOps.hostOf($"a"))
        // localCheckpoint, not persist: blocks are reclaimed by the
        // ContextCleaner when the plan goes out of scope — a persist here
        // would leak one cached relation per candidateStage call for the
        // session lifetime
        val domCounts = withDom.groupBy($"dom").count().localCheckpoint()
        val droppedPairs = domCounts.filter($"count" > cap)
          .agg(coalesce(sum($"count" - cap), lit(0L))).first().getLong(0)
        if (droppedPairs > 0)
          System.err.println(s"[graft.pipeline] per-domain cap $cap dropped " +
            s"$droppedPairs candidate pairs (flooded domains)")
        spark.sparkContext.setLocalProperty("graft.pipeline.droppedDomainPairs",
          droppedPairs.toString)
        val flooded = domCounts.filter($"count" > cap).select($"dom")
        val okPairs = withDom.join(broadcast(flooded), Seq("dom"), "left_anti")
        val floodPairs = withDom.join(broadcast(flooded), Seq("dom"), "left_semi")
        val salts = 64
        val w1 = org.apache.spark.sql.expressions.Window
          .partitionBy($"dom", $"salt").orderBy($"a", $"b")
        val w2 = org.apache.spark.sql.expressions.Window
          .partitionBy($"dom").orderBy($"a", $"b")
        // phase 1 keeps each salt's first `cap` by (a,b): every pair in the
        // domain's global first `cap` survives (its in-salt rank <= its
        // global rank), so phase 2 reproduces the exact unsalted top-cap
        // over <= salts x cap rows per domain.
        val kept = floodPairs
          .withColumn("salt", pmod(xxhash64($"a", $"b"), lit(salts)))
          .withColumn("r1", row_number().over(w1)).filter($"r1" <= cap)
          .withColumn("r2", row_number().over(w2)).filter($"r2" <= cap)
        okPairs.select($"a", $"b").unionByName(kept.select($"a", $"b"))
    }
  }

  /** url -> exact-group representative (lexicographic min url of the
    * exact-hash group). The arbiter's exact short-circuit
    * (arbiter.py:358-394) done set-wise: members of a group are duplicates
    * of the rep by definition, so only reps go through LSH — identical
    * signatures never meet in a bucket (the single worst skew source for
    * boilerplate-heavy corpora), and exact pairs never burn candidate
    * budget. O(n) star edges replace O(n^2) intra-group pairs.
    */
  def repMap(spark: SparkSession, norm: Dataset[DocNorm]): DataFrame = {
    import spark.implicits._
    // Shape note (r06 audit): groupBy + join-back deliberately, NOT a
    // window min over exact_hash — the window would buffer each whole
    // exact-group in one task (a mega exact-group of boilerplate-identical
    // pages is exactly the skew the star-edge collapse exists for), while
    // the groupBy partial-aggregates map-side and the join-back is
    // AQE-skew-splittable.
    val roots = norm.groupBy($"exact_hash").agg(min($"url").as("rep"))
    norm.select($"url", $"exact_hash".as("eh"))
      .join(roots, $"eh" === $"exact_hash")
      .select($"url", $"rep")
  }

  /** Star edges for exact-duplicate groups: rep -> member. */
  def exactEdges(spark: SparkSession, reps: DataFrame): DataFrame = {
    import spark.implicits._
    reps.filter($"url" =!= $"rep").select($"rep".as("a"), $"url".as("b"))
  }

  /** Stage 5: verify + decide. Pure column math for the two signature
    * learners; embedding + suffix-array span pass computed only for the
    * pair subset whose outcome depends on them.
    *
    * Shuffle-payload design: the first pair join carries only fixed-width
    * columns (the numPerm-long minhash signature, simhash words, exact
    * hash) — the size-unbounded hashed-shingle arrays are joined ONLY for
    * pairs whose signature-equality estimate lands inside the
    * (estSkipLow, estSkipHigh) uncertainty band around the vote threshold.
    * Out-of-band pairs use the estimate as their jaccard score (the
    * reference's own estimate semantics, minhash_model.py:483-487);
    * in-band pairs get the exact merge-count Jaccard, so every decision
    * near the threshold is exact.
    */
  def verifyStage(spark: SparkSession, cands: Dataset[CandPair], sigs: Dataset[DocSig],
                  norm: Dataset[DocNorm], conf: DedupConfig,
                  embNanos: Option[org.apache.spark.util.LongAccumulator] = None,
                  spanNanos: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[Verdict] = {
    import spark.implicits._

    // native Catalyst expression (codegen'd merge over ArrayData, no UDF
    // row conversion) — registered idempotently for sessions built in code;
    // spark-submit deployments get it via spark.sql.extensions=
    // graft.expr.GraftExtensions
    graft.expr.JaccardSorted.register(spark)
    def jaccardCol(a: String, b: String) =
      expr(s"${graft.expr.JaccardSorted.name}($a, $b)")

    val bits = conf.simhashBits
    val hammingCol = (bit_count($"a_hi".bitwiseXOR($"b_hi")) +
      bit_count($"a_lo".bitwiseXOR($"b_lo"))).as("hamming")

    require(Seq(conf.verifyCoGroup, conf.estPrefilter, conf.bbitPrefilter).count(identity) <= 1,
      "verifyCoGroup / estPrefilter / bbitPrefilter select conflicting verify dataflows - enable at most one")
    val anyPrefilter = conf.estPrefilter || conf.bbitPrefilter
    val scored: DataFrame = if (conf.verifyCoGroup) {
      coGroupScore(spark, cands, sigs, conf)
    } else if (!anyPrefilter) {
      // Default: single pair join carrying the shingle arrays once.
      // Measured faster whenever the estimate-skip fraction is low or the
      // pairs side is broadcastable (every sandbox corpus; see
      // DedupConfig.estPrefilter).
      val sa = sigs.select($"url".as("a_url"), $"shingles".as("a_sh"),
        $"exact_hash".as("a_eh"), $"simhash_hi".as("a_hi"), $"simhash_lo".as("a_lo"))
      val sb = sigs.select($"url".as("b_url"), $"shingles".as("b_sh"),
        $"exact_hash".as("b_eh"), $"simhash_hi".as("b_hi"), $"simhash_lo".as("b_lo"))
      // SHUFFLE_HASH: sort-merge would SORT the array-carrying relations —
      // at the 150k-page bench that is two sorts of ~2.4 GB of fat rows per
      // join, the verify stage's dominant CPU once the span pass went
      // linear. Hash-join streams the pairs side instead; the build side is
      // the per-partition slice of the doc-keyed sig relation (~tens of MB).
      cands.toDF()
        .join(sa.hint("SHUFFLE_HASH"), $"a" === $"a_url")
        .join(sb.hint("SHUFFLE_HASH"), $"b" === $"b_url")
        .withColumn("exact", $"a_eh" === $"b_eh")
        .withColumn("jaccard", jaccardCol("a_sh", "b_sh"))
        .withColumn("jaccard_est", lit(false))
        .withColumn("hamming", hammingCol)
        .withColumn("sim_sim", greatest(lit(0.0), lit(1.0) - $"hamming" / lit(bits.toDouble)))
        .select($"a", $"b", $"exact", $"jaccard", $"jaccard_est", $"hamming", $"sim_sim")
    } else {
      // Prefilter dataflow: the pair join ships only fixed-width columns;
      // the size-unbounded shingle arrays join in for the estimate-
      // uncertainty band only, and the skip/exact branches are unioned
      // (no join-back shuffle). bbitPrefilter ships the 4-bit packed
      // signature (5 longs, 40 B) instead of the full 64-long array and
      // widens the band by bbitBandMargin (DedupConfig scaladoc).
      val mhCol: Column = if (conf.bbitPrefilter)
        graft.sig.BBitMinHash.packExpr("minhash", conf.numPerm) else $"minhash"
      val sa = sigs.select($"url".as("a_url"), mhCol.as("a_mh"), $"n_shingles".as("a_nsh"),
        $"exact_hash".as("a_eh"), $"simhash_hi".as("a_hi"), $"simhash_lo".as("a_lo"))
      val sb = sigs.select($"url".as("b_url"), mhCol.as("b_mh"), $"n_shingles".as("b_nsh"),
        $"exact_hash".as("b_eh"), $"simhash_hi".as("b_hi"), $"simhash_lo".as("b_lo"))
      // signature-equality estimate (codegen'd higher-order fns, no UDF);
      // the b-bit form applies the collision correction so both modes
      // estimate the SAME quantity (Jaccard), just at different noise
      val estCol: Column = if (conf.bbitPrefilter) {
        val n = conf.numPerm
        greatest(lit(0.0),
          (graft.sig.BBitMinHash.matchCountExpr("a_mh", "b_mh", n) * lit(16.0) - lit(n.toDouble)) /
            lit(n * 15.0))
      } else expr(
        "size(filter(zip_with(a_mh, b_mh, (x, y) -> x = y), v -> v)) / CAST(size(a_mh) AS DOUBLE)")
      val skipLow = if (conf.bbitPrefilter) conf.estSkipLow - conf.bbitBandMargin else conf.estSkipLow
      val skipHigh = if (conf.bbitPrefilter) conf.estSkipHigh + conf.bbitBandMargin else conf.estSkipHigh
      val pre = cands.toDF()
        .join(sa, $"a" === $"a_url").join(sb, $"b" === $"b_url")
        .withColumn("exact", $"a_eh" === $"b_eh")
        .withColumn("est", estCol)
        .withColumn("hamming", hammingCol)
        .withColumn("sim_sim", greatest(lit(0.0), lit(1.0) - $"hamming" / lit(bits.toDouble)))
        // empty shingle sets carry sentinel signatures (est 1.0 vs another
        // empty set) — always resolve those exactly (jaccardSorted: both
        // empty -> 0.0, the reference's _jaccard_from_sets)
        .withColumn("need_exact_j", !$"exact" &&
          (($"est" > skipLow && $"est" < skipHigh) ||
            $"a_nsh" === 0 || $"b_nsh" === 0))
        .select($"a", $"b", $"exact", $"est", $"hamming", $"sim_sim",
          $"need_exact_j", $"a_nsh", $"b_nsh")
        // narrow pairs-sized relation (~100B/row); checkpointing lets the
        // two branches split WITHOUT re-running the pair join (and, unlike
        // persist, local blocks are reclaimed by the ContextCleaner when
        // the plan goes out of scope — no session-lifetime cache leak)
        .transform(d => ckpt(spark, d, conf))
      val ja = sigs.select($"url".as("ja_url"), $"shingles".as("ja_sh"))
      val jb = sigs.select($"url".as("jb_url"), $"shingles".as("jb_sh"))
      val skipBranch = pre.filter(!$"need_exact_j")
        .withColumn("jaccard",
          when($"exact", when($"a_nsh" === 0 && $"b_nsh" === 0, 0.0).otherwise(1.0))
            .otherwise($"est"))
        // exact pairs get the definitionally-exact 1.0/0.0, not an estimate
        .withColumn("jaccard_est", !$"exact")
      val exactBranch = pre.filter($"need_exact_j")
        .join(ja.hint("SHUFFLE_HASH"), $"a" === $"ja_url")
        .join(jb.hint("SHUFFLE_HASH"), $"b" === $"jb_url")
        .withColumn("jaccard", jaccardCol("ja_sh", "jb_sh"))
        .withColumn("jaccard_est", lit(false))
      val cols = Seq($"a", $"b", $"exact", $"jaccard", $"jaccard_est", $"hamming", $"sim_sim")
      skipBranch.select(cols: _*).unionByName(exactBranch.select(cols: _*))
    }

    // base is consumed by FOUR subtrees (span subset, emb subset, the
    // final left join, and the window budget): checkpointing materializes
    // the pair join ONCE as this narrow fixed-width relation (~100 B/row).
    // Without it each consumer re-runs the array-carrying join — measured
    // as three separate 2.4 GB map stages at the 150k-page bench. Local
    // blocks are reclaimed by the ContextCleaner when the plan goes out of
    // scope; reliableCheckpoints switches to durable checkpoint().
    val base = ckpt(spark, scored
      .withColumn("vote_sim", $"sim_sim" >= conf.thrSimhash)
      .withColumn("vote_min", $"jaccard" >= conf.thrMinhash)
      .withColumn("votes_base", $"vote_sim".cast("int") + $"vote_min".cast("int"))
      .select($"a", $"b", $"exact", $"jaccard", $"jaccard_est", $"hamming", $"sim_sim",
        $"vote_sim", $"vote_min", $"votes_base"), conf)

    val need = conf.requiredVotes

    // Subset that still needs per-text work: embedding tiebreak and/or the
    // suffix-array span pass.
    val needEmb = !$"exact" && lit(conf.embedEnabled) && ($"votes_base" === (need - 1))
    val wouldBeNonDup = !$"exact" && ($"votes_base" < need) &&
      !(lit(conf.embedEnabled) && $"votes_base" === (need - 1))
    val needSpan = lit(conf.spanPassEnabled) &&
      ($"jaccard" >= conf.spanCandidateMinJaccard) && (needEmb || wouldBeNonDup)

    // the SA pass is advisory (spanAsDuplicate off = parity) — budget it
    // per doc so boilerplate-heavy corpora can't drown the verify stage
    val spanW = org.apache.spark.sql.expressions.Window
      .partitionBy($"a").orderBy($"jaccard".desc, $"b")
    val cumW = spanW.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val subPre = base.filter(needEmb || needSpan)
      .withColumn("do_emb", needEmb).withColumn("do_span", needSpan)
      .withColumn("span_rn", sum(when(needSpan, 1).otherwise(0)).over(cumW))
      .withColumn("do_span", needSpan && $"span_rn" <= conf.spanMaxPairsPerDoc)
    // Opt-in per-doc embedding budget (DedupConfig.embMaxPairsPerDoc): keep
    // each anchor doc's `cap` highest-jaccard gray-zone pairs for the
    // embedding pass; the rest resolve with vote_emb = false (emb_cos stays
    // null). Same anchor/window convention as the span budget. Drops are
    // counted (one extra job, opted-in runs only) and logged.
    val subBudget = conf.embMaxPairsPerDoc match {
      case None => subPre
      case Some(cap) =>
        val d0 = subPre
          .withColumn("emb_rn", sum(when($"do_emb", 1).otherwise(0)).over(cumW))
        val dropped = d0.filter($"do_emb" && $"emb_rn" > cap).count()
        val d = d0.withColumn("do_emb", $"do_emb" && $"emb_rn" <= cap)
        if (dropped > 0)
          System.err.println(s"[graft.pipeline] emb budget dropped $dropped gray-zone pairs (> $cap per doc)")
        spark.sparkContext.setLocalProperty("graft.pipeline.embBudgetDropped", dropped.toString)
        d
    }
    val subset = subBudget
      .filter($"do_emb" || $"do_span")
      .select($"a", $"b", $"do_emb", $"do_span")

    val dim = conf.embedDim
    val spanCap = conf.spanMaxTextChars

    // ---- embedding tiebreak, two-phase (per-doc embed ONCE) ----
    // Each doc in an emb-needing pair is embedded exactly once and the
    // fixed-width vectors join onto the pairs. The previous design embedded
    // inside the pair pass behind a per-partition cache, whose hit rate —
    // and therefore the stage's CPU — collapsed as partition count grew
    // (measured 9.5 core-s at 4 shuffle partitions vs 100.6 core-s at 16
    // for the identical 1.48M pairs). Per-doc embed is partitioning-
    // independent and is the only shape that survives a real embedding
    // model at corpus scale.
    val embPairsIn = subset.filter($"do_emb").select($"a", $"b")
    // cheap emptiness probe over the checkpointed base: when no pair needs
    // the embedding tiebreak (common under high-threshold configs), skip
    // the eager docEmb materialization job entirely
    val anyEmbPairs = !embPairsIn.isEmpty
    val embUrls = embPairsIn.select($"a".as("url"))
      .union(embPairsIn.select($"b".as("url"))).distinct()
    val docEmbLazy = embUrls.join(norm.select($"url", $"norm_text"), "url")
      .as[(String, String)]
      .map { case (u, t) =>
        val t0 = System.nanoTime()
        val v = CheapEmbed.embed(t, dim)
        embNanos.foreach(_.add(System.nanoTime() - t0))
        (u, v)
      }.toDF("url", "vec")
    // consumed by both pair sides — materialize so docs embed once
    val docEmb = if (anyEmbPairs) ckpt(spark, docEmbLazy, conf) else docEmbLazy
    // ---- two INDEPENDENT per-pair passes, each ending narrow ----
    // Round 3 ran one conditional-join chain for both learners (vectors and
    // span texts attached in four consecutive SHUFFLE_HASH joins, one
    // mapPartitions). That cascade re-ships every earlier payload through
    // every later exchange: by the span joins each emb pair carried
    // va+vb (2 x embedDim floats = 3 kB) plus a span-capped text — at the
    // 450k-page cluster bench those were the two dominant stages (16 + 19 GB
    // of shuffle, 58.8 GB total, PipeProbe 2026-08-17). Splitting the paths
    // means each pair ships only the payload its own learner reads, and
    // each pass ends in a fixed-width (a, b, score) relation, so the fat
    // bytes cross exactly ONE exchange (the second side join feeds the
    // map in the same stage). Costs one extra narrow join onto `base` +
    // a few scheduling-bound jobs — noise at any corpus size against
    // tens of GB of exchange traffic. Results are bit-identical: same
    // per-pair math, same left-join-onto-base semantics.
    val embScored: DataFrame = embPairsIn
      .join(docEmb.select($"url".as("ea"), $"vec".as("va")).hint("SHUFFLE_HASH"),
        $"a" === $"ea")
      .join(docEmb.select($"url".as("eb"), $"vec".as("vb")).hint("SHUFFLE_HASH"),
        $"b" === $"eb")
      .select($"a", $"b", $"va", $"vb")
      .as[(String, String, Array[Float], Array[Float])]
      .mapPartitions { it =>
        it.map { case (a, b, va, vb) =>
          val t0 = System.nanoTime()
          val cos = CheapEmbed.cosine(va, vb)
          embNanos.foreach(_.add(System.nanoTime() - t0))
          (a, b, cos)
        }
      }.toDF("ea_", "eb_", "emb_cos")
    // Texts are capped to spanMaxTextChars IN the projection, so the pair
    // shuffle never carries bytes the suffix automaton won't read. No
    // explicit repartition on the automaton path: the pass is byte-normal
    // (~0.2ms/pair), AQE's size-based partitioning spreads it fine — the
    // old repartition(2x parallelism) round-tripped the full pair+text
    // relation (2.8 GB at the 150k-page bench) to protect a CPU profile
    // the suffix-array path no longer has (spanViaAutomaton=false keeps it).
    val na = norm.select($"url".as("na_url"),
      substring($"norm_text", 1, spanCap).as("a_text"))
    val nb = norm.select($"url".as("nb_url"),
      substring($"norm_text", 1, spanCap).as("b_text"))
    val spanWithTexts = subset.filter($"do_span").select($"a", $"b")
      .join(na.hint("SHUFFLE_HASH"), $"a" === $"na_url")
      .join(nb.hint("SHUFFLE_HASH"), $"b" === $"nb_url")
      .select($"a", $"b", $"a_text", $"b_text")
      .as[(String, String, String, String)]
    val spanBase =
      if (conf.spanViaAutomaton) spanWithTexts
      else spanWithTexts.repartition(spark.sparkContext.defaultParallelism * 2)
    val spanScored: DataFrame = spanBase
      .mapPartitions { it =>
        val useAutomaton = conf.spanViaAutomaton
        val ws = if (useAutomaton) null else new SuffixLCS.Workspace(2 * spanCap + 1)
        val wsAuto = if (useAutomaton) new graft.sa.SuffixAutomaton.Workspace(spanCap) else null
        it.map { case (a, b, at, bt) =>
          val t0 = System.nanoTime()
          val span =
            if (useAutomaton) graft.sa.SuffixAutomaton.lcs(at, bt, wsAuto)
            else SuffixLCS.longestCommonSubstring(at, bt, ws)
          spanNanos.foreach(_.add(System.nanoTime() - t0))
          (a, b, span)
        }
      }.toDF("sa_", "sb_", "shared_span_len")

    val thrEmb = conf.thrEmbedCosine
    val spanDup = conf.spanAsDuplicate
    val spanMin = conf.spanMinChars

    val joined = base
      .join(embScored, $"a" === $"ea_" && $"b" === $"eb_", "left")
      .join(spanScored, $"a" === $"sa_" && $"b" === $"sb_", "left")
      .withColumn("shared_span_len", coalesce($"shared_span_len", lit(0)))
      // Embedding vote (arbiter.py:260-320, uncalibrated): backstop
      // cos >= cosine_threshold OR (cos+1)/2 >= cosine_threshold.
      .withColumn("vote_emb", coalesce(
        ($"emb_cos" >= thrEmb) || ((($"emb_cos" + 1.0) / 2.0) >= thrEmb), lit(false)))
      .withColumn("votes",
        when($"exact", lit(3))
          .otherwise($"votes_base" + $"vote_emb".cast("int")))

    val labeled = joined
      .withColumn("is_dup",
        $"exact" || ($"votes" >= need) ||
          (lit(spanDup) && $"shared_span_len" >= spanMin))
      .withColumn("final_label", when($"is_dup", "DUPLICATE").otherwise("NON_DUPLICATE"))
      .withColumn("dup_kind",
        when($"exact", "EXACT").when($"is_dup", "NEAR").otherwise(lit(null).cast("string")))
      .withColumn("reason",
        when($"exact", "exact_content_match")
          .when($"is_dup" && ($"votes" >= need), "duplicate_by_consensus")
          .when($"is_dup", "shared_span")
          .otherwise("confident_non_duplicate"))

    labeled.select($"a", $"b",
        when($"a" <= $"b", concat($"a", lit("||"), $"b"))
          .otherwise(concat($"b", lit("||"), $"a")).as("pair_key"),
        $"exact", $"jaccard", $"jaccard_est", $"hamming", $"sim_sim", $"emb_cos",
        ($"exact" || $"vote_sim").as("vote_sim"),
        ($"exact" || $"vote_min").as("vote_min"),
        ($"exact" || $"vote_emb").as("vote_emb"),
        $"votes", $"shared_span_len", $"final_label", $"dup_kind", $"reason")
      .as[Verdict]
  }

  /** Partition-aware pair scorer (DedupConfig.verifyCoGroup) — the same
    * (a, b, exact, jaccard, jaccard_est, hamming, sim_sim) relation as the
    * join dataflow, with array shuffle bytes decoupled from PAIR count.
    *
    * Dataflow: pairs hash-route to partition pid(a); the needed doc
    * payloads (exact hash, sorted hashed shingles, simhash words) ship
    * once per DISTINCT (doc, target-partition) — computed as a distinct
    * (url, part) need-set joined once against the signature relation —
    * and one groupByKey co-locates payloads with pairs, which are scored
    * in-partition against a hash map of the local payload slice (the same
    * memory a SHUFFLE_HASH build side would hold; pairs buffer narrow at
    * ~100 B/row until the map is complete, since group iterator order is
    * unspecified).
    *
    * Why: in the join dataflow the second pair join re-shuffles pairs WITH
    * the first doc's shingle array attached — one array copy per PAIR.
    * At pairs/doc >> partitions (the heavy web regime: 15.8M pairs over
    * 450k docs at the scaling bench) that term dominates every exchange;
    * here a doc's array crosses the wire at most (1 + partitions touched
    * by its pairs) times regardless of how many pairs it is in.
    */
  private def coGroupScore(spark: SparkSession, cands: Dataset[CandPair],
                           sigs: Dataset[DocSig], conf: DedupConfig): DataFrame = {
    import spark.implicits._
    // Route keys >> reducer count: with nKeys == reducers, balls-in-bins
    // puts 3-4 whole route-groups on one reducer (~3x stage skew). A 16x
    // key space costs almost nothing extra — a doc's a-side pairs all
    // share ONE key regardless (pid depends only on a), and its b-side
    // duplication is bounded by its pair degree, not by the key count —
    // while letting the hash spread groups evenly over reducers.
    val nParts = spark.sessionState.conf.numShufflePartitions * 16
    val bits = conf.simhashBits
    def pidCol(c: org.apache.spark.sql.Column) = pmod(xxhash64(c), lit(nParts)).cast("int")

    val sigSlim = sigs.toDF()
      .select($"url", $"exact_hash", $"shingles", $"simhash_hi", $"simhash_lo")
    val need = cands.toDF().select($"a".as("url"), pidCol($"a").as("part"))
      .union(cands.toDF().select($"b".as("url"), pidCol($"a").as("part")))
      .distinct()
    // one array shuffle: payloads keyed by url meet the need-set, then
    // route to their target partitions (|need| rows, not |pairs|)
    val shipped = need.join(sigSlim.hint("SHUFFLE_HASH"), "url")
      .select($"part", $"url", $"exact_hash", $"shingles",
        $"simhash_hi", $"simhash_lo", lit(null).cast("string").as("b"))
    val pairRows = cands.toDF().select(pidCol($"a").as("part"), $"a".as("url"),
      lit(null).cast("string").as("exact_hash"),
      lit(null).cast("array<bigint>").as("shingles"),
      lit(0L).as("simhash_hi"), lit(0L).as("simhash_lo"), $"b")
    val all = shipped.unionByName(pairRows)
      .as[(Int, String, String, Array[Long], Long, Long, String)]
    all.groupByKey(_._1).flatMapGroups { (_, it) =>
      val docs = new java.util.HashMap[String, (String, Array[Long], Long, Long)]()
      val pending = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      it.foreach {
        case (_, url, eh, sh, hi, lo, null) => docs.put(url, (eh, sh, hi, lo))
        case (_, a, _, _, _, _, b) => pending += ((a, b))
      }
      pending.iterator.flatMap { case (a, b) =>
        val da = docs.get(a)
        val db = docs.get(b)
        if (da == null || db == null) Iterator.empty // mirror the inner join
        else {
          val ham = java.lang.Long.bitCount(da._3 ^ db._3) +
            java.lang.Long.bitCount(da._4 ^ db._4)
          Iterator.single((a, b, da._1 == db._1,
            graft.sig.MinHashSig.jaccardSorted(da._2, db._2), ham))
        }
      }
    }.toDF("a", "b", "exact", "jaccard", "hamming")
      .withColumn("jaccard_est", lit(false))
      .withColumn("sim_sim", greatest(lit(0.0), lit(1.0) - $"hamming" / lit(bits.toDouble)))
      .select($"a", $"b", $"exact", $"jaccard", $"jaccard_est", $"hamming", $"sim_sim")
  }

  /** Stage 6: clustering. CC runs ONLY over the rep-level near-duplicate
    * edges (tiny compared to the corpus); exact members then attach to
    * their rep's component with one join — equivalent to CC over
    * near-edges ∪ star-edges because a rep is the min url of its group.
    * Cluster id = min member url; singletons excluded
    * (near_duplicate.py:364-371).
    */
  def clusterStage(spark: SparkSession, verdicts: Dataset[Verdict], reps: DataFrame,
                   conf: DedupConfig = DedupConfig.balanced): DataFrame = {
    import spark.implicits._
    val nearEdges = verdicts.filter($"final_label" === "DUPLICATE").select($"a", $"b")
    val repComp = ConnectedComponents.run(spark, nearEdges, reliable = conf.reliableCheckpoints)
      .select($"url".as("rep2"), $"comp")
    val assigned = reps.join(repComp, $"rep" === $"rep2", "left")
      .select($"url", coalesce($"comp", $"rep").as("cluster_id"))
    val sizes = assigned.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, "cluster_id")
      .filter($"cluster_size" >= 2)
      .select($"url", $"cluster_id", $"cluster_size")
  }

  // ---------- orchestration with persist / resume / lineage ----------

  final case class StageResult(name: String, rows: Long, wallMs: Long, skipped: Boolean)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stageDone(spark: SparkSession, dir: String, confHash: String): Boolean = {
    val f = fs(spark, dir)
    f.exists(new Path(dir, "_SUCCESS")) && f.exists(new Path(dir, s"_graft_conf_$confHash"))
  }

  private def markStage(spark: SparkSession, dir: String, confHash: String): Unit = {
    val f = fs(spark, dir)
    val out = f.create(new Path(dir, s"_graft_conf_$confHash"), true)
    out.write(confHash.getBytes("UTF-8")); out.close()
  }

  private def writeLineage(spark: SparkSession, runDir: String, runId: String, stage: String,
                           confHash: String, df: DataFrame, wallMs: Long): Unit = {
    import spark.implicits._
    df.groupBy(spark_partition_id().as("partition_id")).agg(count(lit(1)).as("rows"))
      .withColumn("run_id", lit(runId))
      .withColumn("stage", lit(stage))
      .withColumn("wall_ms", lit(wallMs))
      .withColumn("config_hash", lit(confHash))
      .write.mode(SaveMode.Overwrite).parquet(s"$runDir/lineage/$stage")
  }

  /** Run (or resume) the full pipeline. Every stage persists to
    * `$runDir/<stage>` and is skipped on re-run when its output and config
    * marker are present — the north rule's checkpoint-based resume.
    *
    * Lineage snapshots are written CONCURRENTLY with the next stage's
    * compute (guide §2.6 "overlap independent jobs"): the lineage job for
    * stage N depends only on N's persisted parquet, so it back-fills
    * executor slots freed by N+1's stragglers instead of serializing ~7
    * extra jobs onto the critical path. All lineage futures are awaited
    * (and their failures rethrown) before the metrics snapshot reads the
    * lineage dirs, so the post-run state is identical to the sequential
    * orchestration.
    */
  def run(spark: SparkSession, pages: Dataset[Page], runDir: String,
          conf: DedupConfig = DedupConfig.balanced,
          resume: Boolean = true): DataFrame = {
    import spark.implicits._
    val ch = conf.configHash
    val runId = s"run_$ch"
    val pendingLineage = scala.collection.mutable.ArrayBuffer.empty[java.util.concurrent.Future[_]]

    def stage[T](name: String)(compute: => DataFrame): DataFrame = {
      val dir = s"$runDir/$name"
      if (resume && stageDone(spark, dir, ch)) {
        spark.read.parquet(dir)
      } else {
        // label every job this stage triggers (incl. eager checkpoints
        // inside the stage computation) — guide §1.5
        spark.sparkContext.setJobDescription(s"pipeline: $name")
        val t0 = System.nanoTime()
        val written = try {
          compute.write.mode(SaveMode.Overwrite).parquet(dir)
          spark.read.parquet(dir)
        } finally spark.sparkContext.setJobDescription(null)
        val ms = (System.nanoTime() - t0) / 1000000
        pendingLineage += lineagePool.submit(new Runnable {
          def run(): Unit = {
            spark.sparkContext.setJobDescription(s"pipeline: lineage $name")
            writeLineage(spark, runDir, runId, name, ch, written, ms)
          }
        })
        markStage(spark, dir, ch)
        written
      }
    }

    val normDf = stage("01_norm") { normalizeStage(spark, pages).toDF() }
    val norm = normDf.as[DocNorm]

    val repsDf = stage("02_reps") { repMap(spark, norm) }

    // signatures / banding / verification run on exact-group reps only —
    // members are attached via the rep map at cluster time
    val repNorm = norm.join(repsDf.filter($"url" === $"rep").select($"rep"),
      norm("url") === $"rep").drop("rep").as[DocNorm]

    val sigDf = stage("03_sig") {
      // hot-set derivation only runs when the stage itself runs (the block
      // is skipped on resume); it is a pure function of (01_norm, conf), so
      // the 03_sig resume marker covers it. The set is persisted next to the
      // stage so incremental ingest signs NEW batches with the same frozen
      // template vocabulary (IncrementalDedup Scaladoc).
      val hot = graft.sig.Boilerplate.hotShingles(spark, repNorm, conf)
      if (conf.boilerplateMaxDfFrac.isDefined)
        spark.createDataset(hot.toIndexedSeq).toDF("shingle")
          .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$runDir/03_hot")
      signatureStage(spark, repNorm, conf, hot).toDF()
    }
    val sigs = sigDf.as[DocSig]

    val bandDf = stage("04_bands") { bandingStage(spark, sigs, conf).toDF() }
    val bands = bandDf.as[BandRow]

    val candDf = stage("05_cand") {
      val (pairs, droppedBuckets) = candidateStage(spark, bands, conf)
      spark.sparkContext.setLocalProperty("graft.droppedBuckets", droppedBuckets.toString)
      pairs.toDF()
    }
    val cands = candDf.as[CandPair]

    val embAcc = spark.sparkContext.longAccumulator("graft.verify.embNanos")
    val spanAcc = spark.sparkContext.longAccumulator("graft.verify.spanNanos")
    val verdictDf = stage("06_verdicts") {
      // repNorm, not the full norm: the span-text relations ship whole
      // through their SHUFFLE_HASH exchanges, so restricting them to
      // exact-group reps (187k of 450k rows at the scaling corpus) cuts
      // those exchanges ~2.4x — measured +10% on 06_verdicts when this
      // was briefly swapped to the full norm in r06. Results identical
      // either way (pair urls are always reps).
      verifyStage(spark, cands, sigs, repNorm, conf, Some(embAcc), Some(spanAcc)).toDF()
    }
    // summed task time of the per-text learners — the evidence behind the
    // span/embedding budgets. Only set when the stage actually ran: a
    // resumed 06_verdicts leaves the accumulators at 0 and must not clobber
    // the measurement a cold run recorded earlier in this session (metrics
    // snapshots are rewritten on every run() call).
    if (embAcc.value > 0)
      spark.sparkContext.setLocalProperty("graft.embWallMs", (embAcc.value / 1000000L).toString)
    if (spanAcc.value > 0)
      spark.sparkContext.setLocalProperty("graft.spanWallMs", (spanAcc.value / 1000000L).toString)

    val clusters = stage("07_clusters") {
      clusterStage(spark, verdictDf.as[Verdict], repsDf, conf)
    }

    // lineage must be fully on disk (and any write failure surfaced, as the
    // sequential orchestration would have) before the snapshot reads it
    pendingLineage.foreach(_.get())
    writeMetricsSnapshot(spark, runDir, runId, ch, verdictDf, clusters)
    clusters
  }

  /** Two daemon threads for the off-critical-path lineage writes: one per
    * in-flight stage is plenty, and daemon threads never block JVM exit.
    */
  private lazy val lineagePool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(2, new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-lineage-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })

  /** M11 — run-level metrics snapshot (metrics.py:212-281 shape) assembled
    * from the persisted stage outputs and written alongside them.
    *
    * Observability only: never allowed to fail the run — every read is
    * existence-checked and the whole write is exception-fenced (a missing
    * lineage dir on a fully-resumed run must not take down the pipeline).
    */
  def writeMetricsSnapshot(spark: SparkSession, runDir: String, runId: String,
                           confHash: String, verdicts: DataFrame, clusters: DataFrame): Unit =
    try writeMetricsSnapshotUnsafe(spark, runDir, runId, confHash, verdicts, clusters)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] metrics snapshot skipped for $runDir: ${e.getMessage}")
    }

  private def writeMetricsSnapshotUnsafe(spark: SparkSession, runDir: String, runId: String,
                                         confHash: String, verdicts: DataFrame, clusters: DataFrame): Unit = {
    import spark.implicits._
    // ONE aggregation job over the verdicts for both the run summary and
    // the per-text learner pair counts (was two sequential jobs: a
    // Metrics.runSummary pass plus a second emb/span pass over the same
    // relation — guide §1.2 "don't compute things you throw away" applied
    // to whole passes). Expressions are copied verbatim from
    // Metrics.runSummary so the reported values are bit-identical.
    val summaryF = lineagePool.submit(new java.util.concurrent.Callable[org.apache.spark.sql.Row] {
      def call(): org.apache.spark.sql.Row = {
        spark.sparkContext.setJobDescription("pipeline: metrics summary")
        verdicts.agg(
        count(lit(1)).as("total_pairs"),
        sum(when($"final_label" === "DUPLICATE", 1).otherwise(0)).as("duplicates"),
        sum(when($"final_label" === "NON_DUPLICATE", 1).otherwise(0)).as("non_duplicates"),
        sum(when($"final_label" === "UNCERTAIN", 1).otherwise(0)).as("uncertain"),
        sum(when($"dup_kind" === "EXACT", 1).otherwise(0)).as("exact_dups"),
        sum(when($"dup_kind" === "NEAR", 1).otherwise(0)).as("near_dups"),
        (sum(when($"final_label" =!= "UNCERTAIN", 1).otherwise(0)) / count(lit(1)))
          .as("consensus_rate"),
        sum(when($"emb_cos".isNotNull, 1).otherwise(0)).as("e"),
        sum(when($"shared_span_len" > 0, 1).otherwise(0)).as("s")).first()
      }
    })
    // cluster counts run concurrently with the verdict aggregation (two
    // independent tiny jobs — guide §2.6)
    val cRow = clusters.agg(
      countDistinct($"cluster_id").as("n"), count(lit(1)).as("docs")).first()
    val nClusters = cRow.getLong(0)
    val clustered = cRow.getLong(1)
    val lineageDir = new Path(s"$runDir/lineage")
    val f0 = fs(spark, runDir)
    // explicit per-stage paths, not a "lineage/*" glob: Spark's source
    // resolution stats the literal glob string first and logs a spurious
    // WARN + FileNotFoundException stack (harmless but it pollutes the
    // bench log the driver parses)
    val stageDirs =
      if (!f0.exists(lineageDir)) Array.empty[String]
      else f0.listStatus(lineageDir).filter(_.isDirectory).map(_.getPath.toString)
    val lineage =
      if (stageDirs.isEmpty) "[]"
      else spark.read.parquet(stageDirs.toIndexedSeq: _*)
        .groupBy($"stage").agg(max($"wall_ms").as("ms"), sum($"rows").as("rows"))
        .orderBy($"stage").collect()
        .map(r => s"""{"stage":"${r.getString(0)}","wall_ms":${r.getLong(1)},"rows":${r.getLong(2)}}""")
        .mkString("[", ",", "]")
    val dropped = Option(spark.sparkContext.getLocalProperty("graft.droppedBuckets")).getOrElse("0")
    val summary = summaryF.get()
    val embPairs = summary.getLong(7)
    val spanPairs = summary.getLong(8)
    val embMs = Option(spark.sparkContext.getLocalProperty("graft.embWallMs")).getOrElse("0")
    val spanMs = Option(spark.sparkContext.getLocalProperty("graft.spanWallMs")).getOrElse("0")
    val json =
      s"""{"run_id":"$runId","config_hash":"$confHash",
         |"total_pairs":${summary.getLong(0)},"duplicates":${summary.getLong(1)},
         |"non_duplicates":${summary.getLong(2)},"uncertain":${summary.getLong(3)},
         |"exact_dups":${summary.getLong(4)},"near_dups":${summary.getLong(5)},
         |"consensus_rate":${summary.getDouble(6)},
         |"clusters":$nClusters,"clustered_docs":$clustered,
         |"dropped_mega_buckets":$dropped,
         |"emb_pairs":$embPairs,"span_pairs":$spanPairs,
         |"emb_wall_ms":$embMs,"span_wall_ms":$spanMs,
         |"stages":$lineage}""".stripMargin.replace("\n", "")
    val f = fs(spark, runDir)
    val out = f.create(new Path(runDir, "metrics.json"), true)
    out.write(json.getBytes("UTF-8"))
    out.close()
  }
}
