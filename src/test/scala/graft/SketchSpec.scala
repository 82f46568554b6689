package graft

import graft.sketch.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable sketches (sketch/Sketches): the CMS one-sided guarantee, the
  * HLL estimator accuracy, the merge laws (CMS cells ADD, HLL registers
  * MAX across shards), partition invariance, and the rho derivation vs a
  * pure-Scala bit-twiddling recompute.
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tokenDf(n: Int) = {
    import spark.implicits._
    // zipf-ish multiset: token k appears ceil(n/k) times
    (1 to n).flatMap(k => Seq.fill((n + k - 1) / k)(s"tok$k")).toDF("tok")
  }

  test("CMS: est >= true for every item, exact when no collision pressure") {
    import spark.implicits._
    val items = tokenDf(200)
    val sk = Sketches.countMinSketch(items, "tok", d = 4, w = 512)
    val truth = items.groupBy("tok").agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.countMinEstimate(sk, truth.select("tok"), "tok", d = 4, w = 512)
    val joined = est.join(truth, "tok")
      .select($"tok", $"est", $"true_cnt").as[(String, Long, Long)].collect()
    assert(joined.length == 200)
    val under = joined.filter { case (_, e, t) => e < t }
    assert(under.isEmpty, s"CMS underestimated: ${under.take(5).mkString(", ")}")
    // 200 distinct items in 4x512 cells: the min over 4 rows is exact for
    // the vast majority; assert a sane bound rather than a lucky constant.
    val exact = joined.count { case (_, e, t) => e == t }
    assert(exact >= 190, s"only $exact/200 exact under light load")
  }

  test("CMS: cells are partition-invariant and merge by cell-wise SUM") {
    import spark.implicits._
    val all = tokenDf(150)
    val a = all.filter($"tok".rlike("[02468]$"))
    val b = all.filter(!$"tok".rlike("[02468]$"))
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMinSketch(df, "tok", d = 4, w = 256)
        .as[(Int, Long, Long)].collect().toSeq.sorted
    val whole = cells(all)
    assert(cells(all.repartition(32)) == whole, "partition-variant sketch")
    val merged = (cells(a) ++ cells(b))
      .groupBy(c => (c._1, c._2)).map { case ((r, bkt), cs) => (r, bkt, cs.map(_._3).sum) }
      .toSeq.sorted
    assert(merged == whole, "CMS merge law (cell-wise sum) violated")
  }

  test("HLL: registers merge by MAX and estimate lands within 10%") {
    import spark.implicits._
    val n = 5000
    val items = (1 to n).map(k => s"item$k").toDF("tok")
    val p = 8
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "tok", p).as[(Long, Int)].collect().toMap
    val whole = regs(items)
    assert(regs(items.repartition(32)) == whole, "partition-variant registers")
    val a = items.filter($"tok".endsWith("0"))
    val b = items.exceptAll(a)
    val merged = (regs(a).toSeq ++ regs(b).toSeq)
      .groupBy(_._1).map { case (i, rs) => i -> rs.map(_._2).max }
    assert(merged == whole, "HLL merge law (register max) violated")
    val est = Sketches.hllEstimate(whole, p)
    assert(math.abs(est - n) / n < 0.10, s"HLL estimate $est vs exact $n")
  }

  test("rho column matches pure-Scala leading-zero arithmetic") {
    import spark.implicits._
    val items = (1 to 500).map(k => s"x$k").toDF("tok")
    val p = 8
    val got = Sketches.hllRegisters(items, "tok", p).as[(Long, Int)].collect().toMap
    // pure-Scala recompute: same md5-prefix 60-bit uniform, rho from
    // numberOfLeadingZeros on the high 52 bits
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = (1 to 500).map { k =>
      val hex = md.digest(s"0:x$k".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val idx = u % 256
      val rest = u >>> p
      val rho = if (rest == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      (idx, rho)
    }.groupBy(_._1).map { case (i, rs) => i -> rs.map(_._2).max }
    assert(got == exp)
  }

  test("grouped HLL registers equal per-group ungrouped registers") {
    import spark.implicits._
    val items = (1 to 800).map(k => (if (k % 3 == 0) "a" else "b", s"i$k"))
      .toDF("g", "tok")
    val grouped = Sketches.hllRegistersBy(items, "g", "tok", 6)
      .as[(String, Long, Int)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(r => (r._2, r._3)).toMap }
    for (g <- Seq("a", "b")) {
      val solo = Sketches.hllRegisters(items.filter($"g" === g).select("tok"), "tok", 6)
        .as[(Long, Int)].collect().toMap
      assert(grouped(g) == solo, s"group $g diverges from ungrouped registers")
    }
  }

  test("CMS estimate plan broadcasts the sketch (no sketch-side shuffle of queries)") {
    val items = tokenDf(100)
    val sk = Sketches.countMinSketch(items, "tok", d = 4, w = 256)
    val est = Sketches.countMinEstimate(sk, items.distinct(), "tok", d = 4, w = 256)
    val plan = est.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe join:\n$plan")
  }
}
