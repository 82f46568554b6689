package graft

import graft.ml.LogReg
import org.scalatest.funsuite.AnyFunSuite

/** Logistic-regression quality classifier (ml/LogReg): GD convergence,
  * heuristic-distillation accuracy, apply determinism, plan shape.
  */
class LogRegSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val clean =
    "the quick brown fox jumps over the lazy dog and it was a good day for all of us to be here"
  private val junk = "0101 9932 $$$$ !!!! #### 0000 1111 %%%% @@@@ 2222"

  private def corpus(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val t = if (i % 2 == 0) s"$clean number $i" else s"$junk $i"
      (i.toLong, t)
    }.toDF("doc_id", "text")
  }

  test("fit reduces logistic loss monotonically-in-effect (start vs end)") {
    val ex = LogReg.examples(spark, corpus(200), "doc_id", "text", 0.8)
    val l0 = LogReg.loss(ex, new Array[Double](LogReg.FeatureNames.length))
    val w = LogReg.fit(ex, iters = 40, lr = 2.0)
    val l1 = LogReg.loss(ex, w)
    assert(l1 < l0 * 0.5, s"loss $l0 -> $l1 did not halve")
  }

  test("distills the 0.8 quality gate on separated data (accuracy >= 0.95)") {
    import spark.implicits._
    val df = corpus(400)
    val ex = LogReg.examples(spark, df, "doc_id", "text", 0.8)
    // sanity: both classes present
    val pos = ex.filter(_.y == 1.0).count()
    assert(pos > 100 && pos < 300, s"degenerate label split: $pos/400")
    val w = LogReg.fit(ex, iters = 80, lr = 2.0)
    val scored = LogReg.score(spark, df, "doc_id", "text", w)
    val joined = scored.joinWith(ex, scored("doc_id") === ex("doc_id"))
    val agree = joined.filter { case (s2, e) => s2.pass == (e.y == 1.0) }.count()
    assert(agree >= 380, s"agreement $agree/400 below 0.95")
  }

  test("score is deterministic and pass == (logit >= 0)") {
    import spark.implicits._
    val df = corpus(50)
    val w = Array(0.1, 1.0, -2.0, -1.0, 0.5, 0.2, 0.3, 0.4, -0.6, -1.5)
    val a = LogReg.score(spark, df, "doc_id", "text", w).collect().sortBy(_.doc_id)
    val b = LogReg.score(spark, df, "doc_id", "text", w).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    a.foreach(s2 => assert(s2.pass == (s2.logit >= 0.0)))
  }

  test("feature vector matches the FeatureNames contract (bias first)") {
    val f = LogReg.features(graft.text.TextOps.quality(clean))
    assert(f.length == LogReg.FeatureNames.length)
    assert(f(0) == 1.0)
    assert(f.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("plan: scoring is map-only (no Exchange)") {
    val plan = LogReg.score(spark, corpus(5), "doc_id", "text",
      new Array[Double](LogReg.FeatureNames.length)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"LR scoring must not shuffle:\n$plan")
  }
}
