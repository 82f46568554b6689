package graft.plans

import graft.DedupConfig
import graft.calib.Calibration
import graft.model.Schemas._
import graft.sig.{CheapEmbed, MinHashSig, SimHash}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Bootstrap calibration — the reference's exact-duplicate bootstrap
  * (near_duplicate.py:277-331) + adaptive calibration (calibration.py:19-83)
  * re-expressed for scale:
  *
  *  - positives: pairs sharing identical normalized text (star pairs within
  *    each exact-hash group, capped) — scoring is distributed;
  *  - negatives: all pairs among a seeded sample of ~sqrt(2*cap) group
  *    representatives (the reference nested-loops the first reps in dict
  *    order, which is not reproducible and not collectable at 10^12 docs —
  *    a seeded rep sample has the same statistics and stays bounded);
  *  - per-learner scores are collected (bounded by the caps) and fitted on
  *    the driver, like the reference.
  */
object Bootstrap {

  final case class LearnerCalibration(learner: String, method: String,
                                      threshold: Double, brier: Double, ece: Double,
                                      n_pos: Long, n_neg: Long)

  /** `sigs` may be rep-level (the pipeline's signature stage): signatures
    * are resolved through the exact-group rep, which is exact because group
    * members share the rep's normalized text byte-for-byte.
    */
  /** The bounded labeled calibration pair set (and the exact-hash groups
    * relation it derives from) — shared by the calibration fit and the
    * whitening fit, which embeds the same unique-doc sample
    * (fit_calibration embeds each unique doc of its pair set once,
    * embed_model.py:413-425).
    */
  def calibPairs(norm: Dataset[DocNorm], conf: DedupConfig, maxPos: Int, maxNeg: Int)
  : (DataFrame, DataFrame) = {
    val spark = norm.sparkSession
    import spark.implicits._
    val groups = norm.groupBy($"exact_hash")
      .agg(min($"url").as("rep"), count(lit(1)).as("n"))

    // positives: member != rep within multi-member exact groups (star pairs)
    val posPairs = norm.select($"url", $"exact_hash".as("eh"))
      .join(groups.filter($"n" >= 2), $"eh" === $"exact_hash")
      .filter($"url" =!= $"rep")
      .select($"rep".as("a"), $"url".as("b"), lit(1).as("label"))
      .orderBy($"a", $"b").limit(maxPos)

    // negatives: all pairs among a seeded sample of reps
    val nReps = math.max(2, math.ceil(math.sqrt(2.0 * maxNeg)).toInt + 1)
    val reps = groups.select($"rep")
      .orderBy(xxhash64($"rep", lit(conf.seed))).limit(nReps)
    val r2 = reps.select($"rep".as("rep2"))
    val negPairs = reps.crossJoin(r2).filter($"rep" < $"rep2")
      .select($"rep".as("a"), $"rep2".as("b"), lit(0).as("label"))
      .orderBy($"a", $"b").limit(maxNeg)

    (posPairs.unionByName(negPairs), groups)
  }

  /** Whitening fit (G13) over the SAME bounded sample the calibration fit
    * embeds: the distinct docs of the calibration pairs. Driver-side by
    * contract (≤ 2·(maxPos+maxNeg) urls).
    */
  def fitWhitenParams(spark: SparkSession, norm: Dataset[DocNorm], conf: DedupConfig,
                      maxPos: Int = 50000, maxNeg: Int = 50000): graft.sig.CheapEmbed.WhitenParams = {
    import spark.implicits._
    val (pairs, _) = calibPairs(norm, conf, maxPos, maxNeg)
    val urls = pairs.select(explode(array($"a", $"b")).as("url"))
      .distinct().as[String].collect().toSeq
    CalibratedDedup.fitWhitenFromDocs(spark, norm, urls, conf)
  }

  def calibrateWithParams(spark: SparkSession, norm: Dataset[DocNorm], sigs: Dataset[DocSig],
                          conf: DedupConfig, maxPos: Int = 50000, maxNeg: Int = 50000,
                          targetPrecision: Double = 0.98): Seq[(LearnerCalibration, Calibration.Params)] = {
    import spark.implicits._

    val (pairs, groups) = calibPairs(norm, conf, maxPos, maxNeg)

    // url -> rep resolution so rep-level signatures serve member urls
    val urlRep = norm.select($"url".as("m_url"), $"exact_hash".as("m_eh"))
      .join(groups.select($"exact_hash".as("g_eh"), $"rep".as("m_rep")), $"m_eh" === $"g_eh")
      .select($"m_url", $"m_rep")
    val pairsR = pairs
      .join(urlRep.select($"m_url".as("a"), $"m_rep".as("a_rep")), "a")
      .join(urlRep.select($"m_url".as("b"), $"m_rep".as("b_rep")), "b")

    val sa = sigs.select($"url".as("a_url"), $"shingles".as("a_sh"),
      $"simhash_hi".as("a_hi"), $"simhash_lo".as("a_lo"))
    val sb = sigs.select($"url".as("b_url"), $"shingles".as("b_sh"),
      $"simhash_hi".as("b_hi"), $"simhash_lo".as("b_lo"))
    val na = norm.select($"url".as("na_url"), $"norm_text".as("a_text"))
    val nb = norm.select($"url".as("nb_url"), $"norm_text".as("b_text"))

    val bits = conf.simhashBits
    val dim = conf.embedDim
    val scored = pairsR
      .join(sa, $"a_rep" === $"a_url").join(sb, $"b_rep" === $"b_url")
      .join(na, $"a" === $"na_url").join(nb, $"b" === $"nb_url")
      .select($"a", $"b", $"label", $"a_sh", $"b_sh", $"a_hi", $"a_lo", $"b_hi", $"b_lo",
        $"a_text", $"b_text")
      .as[(String, String, Int, Array[Long], Array[Long], Long, Long, Long, Long, String, String)]
      .mapPartitions { it =>
        val embCache = new java.util.HashMap[String, Array[Float]]()
        def embOf(u: String, t: String): Array[Float] = {
          var e = embCache.get(u)
          if (e == null) { e = CheapEmbed.embed(t, dim); embCache.put(u, e) }
          e
        }
        it.map { case (a, b, label, ash, bsh, ahi, alo, bhi, blo, at, bt) =>
          val jac = MinHashSig.jaccardSorted(ash, bsh)
          val sim = SimHash.similarity(ahi, alo, bhi, blo, bits)
          val cos = CheapEmbed.cosine(embOf(a, at), embOf(b, bt))
          (label, sim, jac, CheapEmbed.cosToUnit(cos))
        }
      }.collect()

    val labels = scored.map(_._1)
    val nPos = labels.count(_ == 1).toLong
    val nNeg = labels.count(_ == 0).toLong
    Seq(
      ("simhash", scored.map(_._2)),
      ("minhash", scored.map(_._3)),
      ("embedding", scored.map(_._4))).map { case (name, s) =>
      val p = Calibration.calibrateAdaptive(s, labels, targetPrecision)
      val eceV = Calibration.ece(s.map(Calibration.applyParams(_, p)), labels)
      (LearnerCalibration(name, p.method, p.threshold, p.brier, eceV, nPos, nNeg), p)
    }
  }

  /** Summary rows (for reporting/queries). */
  def calibrate(spark: SparkSession, norm: Dataset[DocNorm], sigs: Dataset[DocSig],
                conf: DedupConfig, maxPos: Int, maxNeg: Int): Seq[LearnerCalibration] =
    calibrateWithParams(spark, norm, sigs, conf, maxPos, maxNeg).map(_._1)

  /** Full per-learner calibration params for the calibrated arbiter. */
  def learnerParams(spark: SparkSession, norm: Dataset[DocNorm], sigs: Dataset[DocSig],
                    conf: DedupConfig, maxPos: Int = 50000, maxNeg: Int = 50000): CalibratedDedup.LearnerParams = {
    val m = calibrateWithParams(spark, norm, sigs, conf, maxPos, maxNeg)
      .map { case (c, p) => c.learner -> p }.toMap
    CalibratedDedup.LearnerParams(m("simhash"), m("minhash"), m("embedding"))
  }
}
