package graft

import graft.metrics.Metrics
import graft.pages.PagesSource.DetRng
import org.scalatest.funsuite.AnyFunSuite

/** The distributed prefix-sum metrics (M2 AUC, M8 threshold sweep) vs
  * driver-side brute-force oracles, including tie-heavy score sets and
  * partition-count invariance (the old implementation used a global
  * single-task Window; these must be exact replacements).
  */
class MetricsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def randomScores(n: Int, seed: Long): Seq[(Double, Int)] = {
    val rng = new DetRng(seed)
    (0 until n).map { _ =>
      // quantized scores force heavy ties
      val s = rng.nextInt(40) / 40.0
      val y = if (rng.nextDouble() < s) 1 else 0
      (s, y)
    }
  }

  private def bruteAuc(data: Seq[(Double, Int)]): Double = {
    val sorted = data.sortBy(_._1)
    val ranks = scala.collection.mutable.HashMap.empty[Double, Double]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val avg = (i + 1 + j).toDouble / 2.0 // avg of ranks i+1..j
      ranks(sorted(i)._1) = avg
      i = j
    }
    val nPos = data.count(_._2 == 1).toLong
    val nNeg = data.size - nPos
    if (nPos == 0 || nNeg == 0) return 0.5
    val rankSum = data.filter(_._2 == 1).map(d => ranks(d._1)).sum
    (rankSum - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
  }

  test("auc matches the brute-force tie-averaged Mann-Whitney on random data") {
    import spark.implicits._
    Seq(17L, 23L, 99L).foreach { seed =>
      val data = randomScores(3000, seed)
      val df = data.toDF("score", "y").repartition(13)
      val row = Metrics.auc(df, "score", "y").first()
      val expected = bruteAuc(data)
      assert(math.abs(row.getDouble(0) - expected) < 1e-12,
        s"seed=$seed got=${row.getDouble(0)} expected=$expected")
      assert(row.getLong(1) == data.count(_._2 == 1))
      assert(row.getLong(2) == data.count(_._2 == 0))
    }
  }

  test("auc degenerate cases: single class -> 0.5") {
    import spark.implicits._
    val allPos = Seq((0.3, 1), (0.9, 1)).toDF("score", "y")
    assert(Metrics.auc(allPos, "score", "y").first().getDouble(0) == 0.5)
  }

  test("threshold sweep matches brute-force cumulative counts at every unique score") {
    import spark.implicits._
    val data = randomScores(2000, 7L)
    val df = data.toDF("score", "y").repartition(7)
    val got = Metrics.thresholdSweep(df, "score", "y")
      .select("thr", "tp", "fp").as[(Double, Long, Long)].collect()
      .map { case (thr, tp, fp) => thr -> ((tp, fp)) }.toMap
    val uniq = data.map(_._1).distinct
    assert(got.size == uniq.size)
    uniq.foreach { thr =>
      val tp = data.count(d => d._1 >= thr && d._2 == 1).toLong
      val fp = data.count(d => d._1 >= thr && d._2 == 0).toLong
      assert(got(thr) == ((tp, fp)), s"thr=$thr got=${got(thr)} expected=($tp,$fp)")
    }
  }

  test("scan results are invariant under input partitioning") {
    import spark.implicits._
    val data = randomScores(1500, 41L)
    val a = Metrics.thresholdSweep(data.toDF("score", "y").repartition(1), "score", "y")
      .collect().map(_.toSeq).toSeq
    val b = Metrics.thresholdSweep(data.toDF("score", "y").repartition(29), "score", "y")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("calibration drift joins snapshots with per-field deltas") {
    import spark.implicits._
    val prev = Seq(("simhash", 0.8, 0.1, 0.02), ("minhash", 0.7, 0.2, 0.03))
      .toDF("learner", "threshold", "brier", "ece")
    val curr = Seq(("simhash", 0.9, 0.05, 0.01), ("embedding", 0.95, 0.3, 0.04))
      .toDF("learner", "threshold", "brier", "ece")
    val rows = Metrics.calibrationDrift(prev, curr).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("simhash", "minhash", "embedding"))
    val sim = rows("simhash")
    assert(math.abs(sim.getDouble(sim.fieldIndex("threshold_delta")) - 0.1) < 1e-12)
    assert(rows("minhash").isNullAt(rows("minhash").fieldIndex("threshold_curr")))
    assert(rows("embedding").isNullAt(rows("embedding").fieldIndex("threshold_prev")))
  }
}
