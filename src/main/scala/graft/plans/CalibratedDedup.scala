package graft.plans

import graft.DedupConfig
import graft.calib.Calibration
import graft.hash.XXH64
import graft.model.Schemas._
import graft.norm.TextNorm
import graft.sig.{CheapEmbed, MinHashSig, SimHash}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Calibrated decision path — the arbiter with use_calibrated=True
  * (arbiter.py:260-353, 358-497) including the escalation loop (A6).
  *
  * Escalation semantics under the engine's document model: documents enter
  * pre-normalized (strict + dates/ids stripped), so the reference's
  * cumulative escalation steps reduce to:
  *  - "normalize_strict": no-op (extras only re-apply what normalization
  *    already did — simhash re-tokenizes the already-strict text, minhash
  *    filters id/date tokens that no longer exist);
  *  - "minhash_alt_shingle": REAL rescore — MinHash Jaccard with k=2;
  *  - "embed_whiten": no-op (whitening params are never fitted in the
  *    default run, _apply_whiten falls through — embed_model.py:550-566).
  * Exactly the behavior the reference exhibits on its own default path;
  * the gray-zone subset is recomputed as a filtered join, never the full
  * pair set.
  */
object CalibratedDedup {

  final case class LearnerParams(sim: Calibration.Params, min: Calibration.Params,
                                 emb: Calibration.Params)

  final case class CalVerdict(a: String, b: String, pair_key: String, exact: Boolean,
                              sim_raw: Double, min_raw: Double, emb_raw: Option[Double],
                              sim_prob: Double, min_prob: Double, emb_prob: Option[Double],
                              min_raw_k2: Option[Double],
                              final_label: String, dup_kind: Option[String], reason: String,
                              escalation_steps: Seq[String])

  /** Pure decision given all scores (mirrors score_pair step order).
    * `minRawK2` is consulted only when the pair lands in the gray zone.
    */
  def decide(conf: DedupConfig, p: LearnerParams,
             exact: Boolean, simRaw: Double, minRaw: Double, embCos: => Double,
             minRawK2: => Double): (String, Option[String], String, Seq[String],
    Double, Double, Option[Double], Option[Double]) = {
    val clamp = (x: Double) => math.min(x, 1.0 - 1e-9)
    if (exact)
      return ("DUPLICATE", Some("EXACT"), "exact_content_match", Nil, 1.0, 1.0, Some(1.0), None)

    val simProb = clamp(Calibration.applyParams(simRaw, p.sim))
    val minProb = clamp(Calibration.applyParams(minRaw, p.min))
    lazy val cos = embCos
    lazy val embRawScore = CheapEmbed.cosToUnit(cos)
    lazy val embProb = clamp(Calibration.applyParams(embRawScore, p.emb))

    def votes(mp: Double): Int = {
      var v = 0
      if (simProb >= p.sim.threshold) v += 1
      if (mp >= p.min.threshold) v += 1
      // embedding backstop first (cosine >= cosine_threshold), then
      // calibrated prob vs threshold — arbiter.py:272-301
      if (cos >= conf.thrEmbedCosine || embProb >= p.emb.threshold) v += 1
      v
    }
    def allClearlyBelow(mp: Double): Boolean =
      simProb < p.sim.threshold - 0.05 && mp < p.min.threshold - 0.05 &&
        embProb < p.emb.threshold - 0.05
    def inGray(mp: Double): Boolean =
      math.abs(simProb - p.sim.threshold) <= 0.05 &&
        math.abs(mp - p.min.threshold) <= 0.05 &&
        math.abs(embProb - p.emb.threshold) <= 0.05

    val need = conf.requiredVotes
    val v0 = votes(minProb)
    if (v0 >= need)
      return ("DUPLICATE", Some("NEAR"), "duplicate_by_consensus", Nil,
        simProb, minProb, Some(embProb), None)
    if (allClearlyBelow(minProb))
      return ("NON_DUPLICATE", None, "below_thresholds", Nil,
        simProb, minProb, Some(embProb), None)
    if (!inGray(minProb))
      return ("NON_DUPLICATE", None, "confident_non_duplicate", Nil,
        simProb, minProb, Some(embProb), None)

    // escalation: step 1 re-scores identically (pre-normalized docs), so it
    // can never flip the verdict; step 2 switches MinHash to k=2; step 3
    // re-scores identically to step 2.
    val k2 = minRawK2
    val minProb2 = clamp(Calibration.applyParams(k2, p.min))
    val steps2 = Seq("normalize_strict", "minhash_alt_shingle")
    val steps3 = steps2 :+ "embed_whiten"
    if (votes(minProb2) >= need)
      return ("DUPLICATE", Some("NEAR"), "consensus_after_escalation", steps2,
        simProb, minProb2, Some(embProb), Some(k2))
    if (allClearlyBelow(minProb2))
      return ("NON_DUPLICATE", None, "below_thresholds_after_escalation", steps2,
        simProb, minProb2, Some(embProb), Some(k2))
    // loop runs to completion; final outputs are the step-3 rescore (same
    // as step 2), so the post-loop checks repeat on minProb2
    if (votes(minProb2) >= need)
      ("DUPLICATE", Some("NEAR"), "consensus_after_escalation", steps3,
        simProb, minProb2, Some(embProb), Some(k2))
    else if (allClearlyBelow(minProb2))
      ("NON_DUPLICATE", None, "below_thresholds_after_escalation", steps3,
        simProb, minProb2, Some(embProb), Some(k2))
    else
      ("UNCERTAIN", None, "uncertain_in_gray_zone", steps3,
        simProb, minProb2, Some(embProb), Some(k2))
  }

  /** k=2 shingle hash set of a doc's normalized text (escalation variant). */
  def k2Shingles(normText: String, conf: DedupConfig): Array[Long] = {
    val simToks = TextNorm.simhashTokens(normText, conf.minTokenLen)
    val toks = simToks.filterNot(TextNorm.DefaultStopwords)
    val tokHashes = toks.map(t => XXH64.hashString(t, DedupPipeline.ShingleHashSeed))
    val n = math.max(0, toks.length - 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = XXH64.hashLongs(tokHashes, i, i + 2, 2L); i += 1 }
    out.distinct.sorted
  }

  /** Distributed calibrated verify over candidate pairs. Gray-zone pairs
    * get the k=2 MinHash variant via a filtered recompute of just their
    * docs (never the corpus).
    */
  def verify(spark: SparkSession, cands: Dataset[CandPair], sigs: Dataset[DocSig],
             norm: Dataset[DocNorm], conf: DedupConfig, params: LearnerParams): Dataset[CalVerdict] = {
    import spark.implicits._

    val sa = sigs.select($"url".as("a_url"), $"shingles".as("a_sh"),
      $"exact_hash".as("a_eh"), $"simhash_hi".as("a_hi"), $"simhash_lo".as("a_lo"))
    val sb = sigs.select($"url".as("b_url"), $"shingles".as("b_sh"),
      $"exact_hash".as("b_eh"), $"simhash_hi".as("b_hi"), $"simhash_lo".as("b_lo"))
    val na = norm.select($"url".as("na_url"), $"norm_text".as("a_text"))
    val nb = norm.select($"url".as("nb_url"), $"norm_text".as("b_text"))

    val c = conf
    val p = params
    val dim = conf.embedDim
    cands.toDF()
      .join(sa, $"a" === $"a_url").join(sb, $"b" === $"b_url")
      .join(na, $"a" === $"na_url").join(nb, $"b" === $"nb_url")
      .select($"a", $"b", $"a_eh", $"b_eh", $"a_sh", $"b_sh",
        $"a_hi", $"a_lo", $"b_hi", $"b_lo", $"a_text", $"b_text")
      .as[(String, String, String, String, Array[Long], Array[Long],
        Long, Long, Long, Long, String, String)]
      .mapPartitions { it =>
        val embCache = new java.util.HashMap[String, Array[Float]]()
        def embOf(u: String, t: String) = {
          var e = embCache.get(u)
          if (e == null) { e = CheapEmbed.embed(t, dim); embCache.put(u, e) }
          e
        }
        val k2Cache = new java.util.HashMap[String, Array[Long]]()
        def k2Of(u: String, t: String) = {
          var s = k2Cache.get(u)
          if (s == null) { s = k2Shingles(t, c); k2Cache.put(u, s) }
          s
        }
        it.map { case (a, b, aeh, beh, ash, bsh, ahi, alo, bhi, blo, at, bt) =>
          val exact = aeh == beh
          val simRaw = SimHash.similarity(ahi, alo, bhi, blo, c.simhashBits)
          val minRaw = MinHashSig.jaccardSorted(ash, bsh)
          var cosMemo: java.lang.Double = null
          def cos: Double = {
            if (cosMemo == null) cosMemo = CheapEmbed.cosine(embOf(a, at), embOf(b, bt))
            cosMemo.doubleValue()
          }
          var k2Memo: java.lang.Double = null
          def k2: Double = {
            if (k2Memo == null) k2Memo = MinHashSig.jaccardSorted(k2Of(a, at), k2Of(b, bt))
            k2Memo.doubleValue()
          }
          val (label, kind, reason, steps, simProb, minProb, embProb, k2Raw) =
            decide(c, p, exact, simRaw, minRaw, cos, k2)
          CalVerdict(a, b, pairKey(a, b), exact, simRaw, minRaw,
            Option(cosMemo).map(cv => CheapEmbed.cosToUnit(cv.doubleValue())),
            simProb, minProb, embProb, k2Raw, label, kind, reason, steps)
        }
      }
  }
}
