package graft.ml

import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Distilled quality classifier: logistic regression over the (already
  * oracle-verified) quality features, fit by deterministic full-batch
  * gradient descent.
  *
  * This is the fastText-style "learned quality gate" every large
  * training-data pipeline ends up with (the reference's fixed-weight
  * score, /root/reference/src/analysis/quality.py, is the hand-tuned
  * ancestor): fit a smooth scorer against labels — here the pseudo-labels
  * from the reference's own composite gate at 0.8, the same
  * heuristic-distillation shape used at web scale — then apply it as a
  * pure per-row projection.
  *
  * Scale/verification design:
  *  - FIT: `iters` full passes over a cached 8-doubles-per-doc feature
  *    table; each pass is one mapPartitions producing a partial gradient
  *    (8 doubles + loss per partition) combined on the driver — the
  *    treeAggregate shape, bounded driver traffic (#partitions × 9
  *    doubles). Like the calibration and KMeans fits, the fit itself is
  *    iterative floating-point and NOT SQL-recomputable (partial-sum
  *    order); the fitted weights are PERSISTED and the apply path is
  *    verified from them.
  *  - APPLY: logit = w0 + w1·f1 + … + w6·f6, a fixed-order multiply-add
  *    chain of IEEE-correctly-rounded ops — bit-identical in DuckDB from
  *    the persisted weights + the shared quality CTEs. The emitted score
  *    is the LOGIT, not sigmoid(logit): libm exp is not correctly
  *    rounded, so the sigmoid is applied only where cross-engine
  *    bit-parity doesn't matter (inside the fit). The decision
  *    `logit >= 0` is exactly `p >= 0.5`.
  *
  * Feature vector (order is part of the contract with the SQL mirror):
  *   f1 alpha_ratio, f2 digit_ratio, f3 punct_ratio, f4 stopword_ratio,
  *   f5 mean_token_len / 10.0, f6 n_chars / (n_chars + 500.0),
  *   f7 min(1, stopword_ratio·4), f8 [3 <= mean_token_len <= 10],
  *   f9 min(1, digit_ratio·5 + punct_ratio·2)
  * — each a few IEEE ops over the byte-verified quality fields. f7-f9
  * are the reference gate's own basis functions (quality.py's saturated
  * terms), which makes the 0.8-gate label exactly linear in the features
  * — the honest distillation setup: the classifier learns the gate's
  * geometry from labels, not from the composite score itself.
  */
object LogReg {

  val FeatureNames: Seq[String] =
    Seq("bias", "alpha_ratio", "digit_ratio", "punct_ratio",
      "stopword_ratio", "mean_tok_over10", "len_sat500",
      "sw_sat4", "mt_in_range", "noise_sat")

  final case class Example(doc_id: Long, y: Double, f: Array[Double])
  final case class Weight(idx: Int, name: String, w: Double)
  final case class Scored(doc_id: Long, logit: Double, pass: Boolean)

  /** Feature row per doc; y = 1.0 iff the composite quality score clears
    * `labelThreshold` (heuristic distillation labels).
    */
  def examples(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
               labelThreshold: Double): Dataset[Example] = {
    import spark.implicits._
    docs.select(idCol, textCol).as[(Long, String)].map { case (id, t) =>
      val q = TextOps.quality(t)
      Example(id, if (q.score >= labelThreshold) 1.0 else 0.0, features(q))
    }
  }

  /** The shared feature transform — mirrored expression-for-expression in
    * the SQL oracle (same op order; each step correctly rounded).
    */
  def features(q: TextOps.Quality): Array[Double] = Array(
    1.0,
    q.alpha_ratio,
    q.digit_ratio,
    q.punct_ratio,
    q.stopword_ratio,
    q.mean_token_len / 10.0,
    q.n_chars.toDouble / (q.n_chars.toDouble + 500.0),
    math.min(1.0, q.stopword_ratio * 4.0),
    if (q.mean_token_len >= 3.0 && q.mean_token_len <= 10.0) 1.0 else 0.0,
    math.min(1.0, q.digit_ratio * 5.0 + q.punct_ratio * 2.0))

  /** Full-batch GD on the mean logistic loss. Deterministic given a fixed
    * partition combine order (partials are combined in partition-index
    * order on the driver).
    */
  def fit(examples: Dataset[Example], iters: Int = 80, lr: Double = 2.0): Array[Double] = {
    val spark = examples.sparkSession
    import spark.implicits._
    val dim = FeatureNames.length
    val cached = examples.cache()
    val n = cached.count().toDouble
    require(n > 0, "empty training set")
    var w = new Array[Double](dim)
    var it = 0
    while (it < iters) {
      val bcW = cached.sparkSession.sparkContext.broadcast(w)
      // per-partition partial gradient; collect() preserves partition order
      val partials = cached.mapPartitions { rows =>
        val g = new Array[Double](dim)
        val wv = bcW.value
        rows.foreach { ex =>
          var z = 0.0; var i = 0
          while (i < dim) { z += wv(i) * ex.f(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val d = p - ex.y
          i = 0
          while (i < dim) { g(i) += d * ex.f(i); i += 1 }
        }
        Iterator.single(g)
      }.collect()
      val grad = new Array[Double](dim)
      partials.foreach { g => var i = 0; while (i < dim) { grad(i) += g(i); i += 1 } }
      val next = new Array[Double](dim)
      var i = 0
      while (i < dim) { next(i) = w(i) - lr * grad(i) / n; i += 1 }
      w = next
      bcW.destroy()
      it += 1
    }
    cached.unpersist()
    w
  }

  /** Mean logistic loss of `w` (spec instrumentation). */
  def loss(examples: Dataset[Example], w: Array[Double]): Double = {
    val spark = examples.sparkSession
    import spark.implicits._
    val dim = w.length
    val (s, n) = examples.mapPartitions { rows =>
      var acc = 0.0; var cnt = 0L
      rows.foreach { ex =>
        var z = 0.0; var i = 0
        while (i < dim) { z += w(i) * ex.f(i); i += 1 }
        // numerically stable log(1+exp(.))
        val l = if (z > 0) z * (1.0 - ex.y) + math.log1p(math.exp(-z))
                else -z * ex.y + math.log1p(math.exp(z))
        acc += l; cnt += 1
      }
      Iterator.single((acc, cnt))
    }.collect().foldLeft((0.0, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
    s / n
  }

  /** Apply: per-row fixed-order multiply-add logit + the >= 0 decision.
    * Shuffle-free map over the corpus.
    */
  def score(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
            w: Array[Double]): Dataset[Scored] = {
    import spark.implicits._
    val dim = w.length
    docs.select(idCol, textCol).as[(Long, String)].map { case (id, t) =>
      val f = features(TextOps.quality(t))
      var z = 0.0; var i = 0
      while (i < dim) { z += w(i) * f(i); i += 1 }
      Scored(id, z, z >= 0.0)
    }
  }
}
